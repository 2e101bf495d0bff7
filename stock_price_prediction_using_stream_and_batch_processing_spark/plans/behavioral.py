"""Behavioral / event-sequence query corpus over the ``events`` table:
ordered funnel, retention cohorts, next-event transition matrix, and
the deterministic global-shuffle total order over documents.

The reference's stream is a price feed; the same (user, ts, type)
shape is every product-analytics event stream, and these are the four
queries such a stream always gets asked. All are single-sort or
groupBy plans (operators/sequences.py, operators/ordering.py) — no
per-user arrays, no single-partition global sorts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import ordering, sequences
from ..sources.tables import load_table
from .core import register

_FUNNEL_STEPS = ["view", "click", "purchase"]


@register(
    "funnel_view_click_purchase",
    oracle="""
    WITH s1 AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS q0
      FROM events
    ), s2 AS (
      SELECT *, CASE WHEN event_type = 'click' AND COALESCE(
               MAX(q0) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) = 1
             THEN 1 ELSE 0 END AS q1
      FROM s1
    ), s3 AS (
      SELECT *, CASE WHEN event_type = 'purchase' AND COALESCE(
               MAX(q1) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) = 1
             THEN 1 ELSE 0 END AS q2
      FROM s2
    )
    SELECT COUNT(DISTINCT CASE WHEN q0 = 1 THEN user_id END) AS n_step_1,
           COUNT(DISTINCT CASE WHEN q1 = 1 THEN user_id END) AS n_step_2,
           COUNT(DISTINCT CASE WHEN q2 = 1 THEN user_id END) AS n_step_3
    FROM s3
    """,
    tags=("behavioral", "funnel", "window"),
    # rotation r6: driver-green r4+r5; retention_cohorts +
    # time_to_conversion + touch_attribution keep the behavioral
    # family's driver evidence (event_transitions is demoted too)
    driver=False,
)
def funnel_view_click_purchase(spark, sf_dir):
    """Strict ordered funnel view → click → purchase: chained
    running-max flags over ONE per-user sort (operators/sequences.
    ordered_funnel), then a count-distinct per step."""
    ev = load_table(spark, sf_dir, "events")
    return sequences.ordered_funnel(
        ev, "user_id", "ts", "event_type", _FUNNEL_STEPS, tiebreak="event_id"
    )


@register(
    "retention_cohorts_events",
    oracle="""
    WITH f AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY user_id
    ), a AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    )
    SELECT f.cohort_day,
           CAST(date_diff('day', f.cohort_day, a.d) AS INTEGER) AS day_offset,
           COUNT(DISTINCT a.user_id) AS n_users
    FROM a JOIN f USING (user_id)
    WHERE date_diff('day', f.cohort_day, a.d) BETWEEN 0 AND 7
    GROUP BY 1, 2
    """,
    tags=("behavioral", "retention", "groupby"),
    driver=False,  # rotation r7: driver-green r4+r6; touch_attribution + time_to_conversion keep the behavioral family's driver evidence
)
def retention_cohorts_events(spark, sf_dir):
    """Cohort-retention grid (first-active day × day offset ≤ 7):
    per-user aggregates joined, final groupBy on the tiny grid
    (operators/sequences.retention_cohorts)."""
    ev = load_table(spark, sf_dir, "events")
    out = sequences.retention_cohorts(ev, "user_id", "ts", max_offset_days=7)
    return out.withColumn("day_offset", F.col("day_offset").cast("int"))


@register(
    "event_transitions_events",
    oracle="""
    WITH p AS (
      SELECT event_type AS src,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
      FROM events
    )
    SELECT src, dst, COUNT(*) AS n,
           ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (PARTITION BY src), 6) AS p
    FROM p WHERE dst IS NOT NULL GROUP BY src, dst
    """,
    tags=("behavioral", "markov", "window"),
    # rotation r6: driver-green r4+r5; retention_cohorts +
    # time_to_conversion + the new attribution query keep the
    # behavioral family's driver evidence
    driver=False,
)
def event_transitions_events(spark, sf_dir):
    """First-order Markov transition matrix of the per-user event
    stream: one lead() window pass, groupBy onto the |types|² grid
    (operators/sequences.transition_matrix)."""
    ev = load_table(spark, sf_dir, "events")
    return sequences.transition_matrix(ev, "user_id", "ts", "event_type", tiebreak="event_id")


@register(
    "global_shuffle_docs",
    oracle="""
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (
             ORDER BY md5('shuf:42:' || CAST(doc_id AS VARCHAR)), doc_id
           ) AS BIGINT) AS shuffle_rank
    FROM documents
    """,
    tags=("sampling", "ordering", "shuffle"),
    # rotation r6: driver-green r4+r5; hash_sample_docs keeps the
    # md5-deterministic-ordering family's driver evidence
    driver=False,
)
def global_shuffle_docs(spark, sf_dir):
    """Deterministic global training-order shuffle: every doc ranked by
    a salted content hash. The rank is computed DISTRIBUTED — because
    the sort key IS a hash (uniform), buckets come from its bit prefix
    (monotone, no boundary sampling, no checkpoint:
    operators/ordering.hashkey_row_number) + per-bucket row_number +
    broadcast prefix offsets. Never a single-partition
    ``row_number() OVER (ORDER BY …)``; for non-hash sort keys the
    sampling-based ``ordering.global_row_number`` is the general form."""
    d = load_table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit("shuf:42:"), F.col("doc_id").cast("string")))
    out = ordering.hashkey_row_number(
        d.select("doc_id", key.alias("_k")), "_k", ["_k", "doc_id"], out="shuffle_rank"
    )
    return out.select("doc_id", F.col("shuffle_rank").cast("long").alias("shuffle_rank"))


@register(
    "touch_attribution_events",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type,
             FIRST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id NULLS LAST
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_touch,
             LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id NULLS LAST
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch
      FROM events
    ),
    p AS (SELECT * FROM o WHERE event_type = 'purchase')
    SELECT attribution, touch_type, CAST(COUNT(*) AS BIGINT) AS n_conversions
    FROM (
      SELECT 'first' AS attribution, first_touch AS touch_type FROM p WHERE first_touch IS NOT NULL
      UNION ALL
      SELECT 'last', last_touch FROM p WHERE last_touch IS NOT NULL
    ) GROUP BY 1, 2
    """,
    tags=("behavioral", "attribution", "window"),
    # r12 rotation: 6 straight driver greens (r6-r11) -> extended tier
    # frees a driver slot for a never-checked face
    driver=False,
)
def touch_attribution_events(spark, sf_dir):
    """First-touch / last-touch purchase attribution
    (operators/sequences.touch_attribution): every purchase credits the
    user's first preceding non-purchase touch ever AND the last touch
    strictly before it — the two standard channel-credit models the
    funnel/retention/conversion family was missing. One per-user
    window pass (the shuffle the family already shares), ordering
    totalized through event_id; the oracle replays the identical
    ignorenulls frame carry."""
    ev = load_table(spark, sf_dir, "events")
    return sequences.touch_attribution(
        ev, "user_id", "ts", "event_type", "event_id", conversion="purchase"
    )


@register(
    "concurrent_sessions_events",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - LAG(ts) OVER win IS NULL
                       OR ts - LAG(ts) OVER win > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
      FROM events WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
      FROM g
    ),
    b AS (
      SELECT user_id, session_id, MIN(ts) AS st, MAX(ts) AS en
      FROM s GROUP BY user_id, session_id
    ),
    bd AS (
      SELECT st AS ts, 1 AS delta, user_id, session_id FROM b
      UNION ALL
      SELECT en, -1, user_id, session_id FROM b
    ),
    r AS (
      SELECT ts, SUM(delta) OVER (ORDER BY ts, -delta, user_id, session_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
      FROM bd
    )
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
           CAST(MAX(conc) AS BIGINT) AS peak_concurrent,
           CAST(COUNT(*) AS BIGINT) AS n_boundaries
    FROM r GROUP BY 1
    """,
    tags=("behavioral", "sweep-line", "prefix-scan", "session", "concurrency"),
)
def concurrent_sessions_events(spark, sf_dir):
    """Peak concurrent sessions per hour — the sweep-line/prefix-scan
    operator: 30-min-gap sessions become (+1 at start, -1 at end)
    boundary events, globally scanned in (ts, starts-first, session)
    total order, max of the running concurrency per hour. The scan is
    the TWO-PHASE distributed prefix sum (operators/prefix.py): range
    partitioning → parallel per-partition scans → broadcast cumulative
    offsets — never the single-partition sort a bare
    ``SUM() OVER (ORDER BY)`` would plan, so at 100 TB the wall-clock
    follows the widest partition, not the table. The oracle replays
    sessionization, the boundary sweep, and the scan in the identical
    total order (integer deltas — sums are order-exact)."""
    from ..operators import prefix, windows

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    sess = windows.sessionize(ev, "user_id", "ts", gap_minutes=30, tiebreak="event_id")
    bounds = sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"), F.max("ts").alias("session_end")
    )
    conc = prefix.interval_concurrency(
        bounds, "session_start", "session_end", ["user_id", "session_id"], out="concurrent"
    )
    return conc.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour_start")
    ).agg(
        F.max("concurrent").cast("long").alias("peak_concurrent"),
        F.count(F.lit(1)).cast("long").alias("n_boundaries"),
    )


@register(
    "copurchase_lift_parts",
    oracle="""
    WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM li),
    ic AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_item FROM li GROUP BY l_partkey),
    p AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             CAST(COUNT(*) AS BIGINT) AS n_ab
      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    )
    SELECT part_a, part_b, n_ab,
           CAST(n_ab AS DOUBLE) / n.n_orders AS support,
           CAST(n_ab AS DOUBLE) / ia.n_item AS confidence_a_b,
           CAST(n_ab * n.n_orders AS DOUBLE) / (ia.n_item * ib.n_item) AS lift
    FROM p CROSS JOIN n
    JOIN ic ia ON ia.l_partkey = p.part_a
    JOIN ic ib ON ib.l_partkey = p.part_b
    """,
    tags=("behavioral", "market-basket", "association-rules", "self-join"),
)
def copurchase_lift_parts(spark, sf_dir):
    """Market-basket association mining over lineitem baskets: parts
    co-occurring in >= 2 orders, with support / confidence / lift. The
    pair generation is the basket self-join keyed on the ORDER — the
    per-basket item count bounds the blowup (a k-item order emits
    k·(k-1)/2 pairs; retail baskets are small, and a degenerate
    mega-basket would be capped the way LSH buckets are), so the one
    shuffle is on orderkey and the candidate count tracks Σk² over
    baskets, never |parts|². Item marginals (|parts| rows) and the
    single-row basket total BROADCAST onto the pair aggregate. Lift =
    (n_ab·N)/(n_a·n_b): exact-integer products, ONE division —
    bit-identical on both engines, no rounding."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = li.select(
        F.countDistinct("l_orderkey").cast("long").alias("n_orders")
    )
    item_counts = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_item")
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
               & (F.col("a.l_partkey") < F.col("b.l_partkey")))
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .filter(F.col("n_ab") >= 2)
    )
    out = (
        pairs.crossJoin(F.broadcast(n_orders))
        .join(
            F.broadcast(item_counts.select(F.col("l_partkey").alias("part_a"),
                                           F.col("n_item").alias("_na"))),
            "part_a",
        )
        .join(
            F.broadcast(item_counts.select(F.col("l_partkey").alias("part_b"),
                                           F.col("n_item").alias("_nb"))),
            "part_b",
        )
    )
    return out.select(
        "part_a", "part_b", "n_ab",
        (F.col("n_ab").cast("double") / F.col("n_orders")).alias("support"),
        (F.col("n_ab").cast("double") / F.col("_na")).alias("confidence_a_b"),
        ((F.col("n_ab") * F.col("n_orders")).cast("double")
         / (F.col("_na") * F.col("_nb"))).alias("lift"),
    )
