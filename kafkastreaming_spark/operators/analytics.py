"""Event-stream analytics: funnel conversion and cohort retention
(extends SURVEY.md §2; declared in §2.15).

The two workhorse product-analytics queries over a clickstream — the
kind of question the reference's Kafka pipeline exists to answer.  Both
are pure min/count aggregation over event time (no float summation), so
they hash-check exactly.

Scale: both shuffle once on ``user_id`` then once on the small grouped
output; at 100 TB events are date-partitioned so the first aggregation
reads pruned partitions, and the per-user state is two timestamps — the
streaming twin is ``applyInPandasWithState`` with exactly that state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreaming_spark.io import EVENTS_ORACLE_CTE, load_table
from kafkastreaming_spark.registry import query


@query(
    "events_funnel",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE},
    clicks AS (
      SELECT user_id, MIN(ts) AS first_click
      FROM events WHERE event_type = 'click' GROUP BY user_id
    ),
    conv AS (
      SELECT c.user_id, c.first_click, MIN(e.ts) AS first_purchase
      FROM clicks c JOIN events e
        ON e.user_id = c.user_id
       AND e.event_type = 'purchase'
       AND e.ts > c.first_click
      GROUP BY c.user_id, c.first_click
    )
    SELECT user_id, first_click, first_purchase,
           CASE WHEN first_purchase <= first_click + INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS converted_30m
    FROM conv
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase funnel: per user, first click and first subsequent
    purchase, flagged if conversion happened within 30 minutes.

    MIN over event time is order-insensitive and exact — no float
    discipline needed.  The purchase scan joins on the user key with the
    time predicate evaluated post-match (same shape as join_theta)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    conv = (
        clicks.join(
            purchases,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") > F.col("first_click")),
        )
        .groupBy("user_id", "first_click")
        .agg(F.min("p_ts").alias("first_purchase"))
    )
    return conv.select(
        "user_id",
        "first_click",
        "first_purchase",
        F.when(
            F.col("first_purchase")
            <= F.col("first_click") + F.expr("INTERVAL 30 MINUTES"),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("converted_30m"),
    )


@query(
    "events_retention",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE},
    firsts AS (
      SELECT user_id, MIN(CAST(date_trunc('day', ts) AS TIMESTAMP)) AS cohort_day
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS active_day
      FROM events
    )
    SELECT f.cohort_day,
           CAST(date_diff('day', f.cohort_day, a.active_day) AS INTEGER) AS day_offset,
           COUNT(DISTINCT f.user_id) AS n_users
    FROM firsts f JOIN activity a USING (user_id)
    GROUP BY f.cohort_day, day_offset
    """,
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users bucketed by first-seen day, then
    distinct active users per (cohort day, day offset).

    The canonical engagement query.  Two hash-aggs on user_id feeding one
    small grouped output; all integer/timestamp math, exact in both
    engines (`datediff` on day-truncated timestamps = whole-day counts)."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    firsts = ev.groupBy("user_id").agg(F.min(day).alias("cohort_day"))
    activity = ev.select("user_id", day.alias("active_day")).distinct()
    return (
        firsts.join(activity, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("active_day"), F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )
