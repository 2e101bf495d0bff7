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
