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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkastreaming_spark.hashing import H_DUCK as _H_DUCK
from kafkastreaming_spark.hashing import H_SPARK as _H_SPARK
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


@query(
    "events_pathing",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE},
    seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type, COUNT(*) AS n_transitions
    FROM seq
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    """,
)
def events_pathing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey transition matrix: for each user's event sequence
    (ordered by ts with event_id as the deterministic tie-break), count
    every consecutive event_type -> event_type transition corpus-wide.

    The Markov-chain view of a clickstream — what product analytics
    calls "pathing".  One shuffle to co-locate each user's history for
    the lag window, then a partial+final count on the tiny (|types|^2)
    transition key.  At 100 TB the window state per user is one row;
    the streaming twin is applyInPandasWithState keeping last_type."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "event_type", F.lag("event_type").over(w).alias("prev_type")
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


@query(
    "events_anomaly",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE},
    cents AS (
      SELECT event_id, event_type, value,
             CAST(ROUND(value * 100) AS BIGINT) AS vc
      FROM events
    ),
    stats AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(vc) AS s1,
             SUM(vc * vc) AS s2
      FROM cents GROUP BY event_type
    ),
    scored AS (
      SELECT c.event_id, c.event_type, c.value,
             ROUND(
               (CAST(c.vc AS DOUBLE)
                - CAST(s.s1 AS DOUBLE) / CAST(s.n AS DOUBLE))
               / sqrt(CAST(s.s2 AS DOUBLE) / CAST(s.n AS DOUBLE)
                      - (CAST(s.s1 AS DOUBLE) / CAST(s.n AS DOUBLE))
                        * (CAST(s.s1 AS DOUBLE) / CAST(s.n AS DOUBLE))),
               6) AS z_score
      FROM cents c JOIN stats s USING (event_type)
    )
    SELECT event_id, event_type, value, z_score
    FROM scored WHERE abs(z_score) > 2.5
    """,
)
def events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population z-score outliers: events whose value sits more than
    2.5 sigma from their event_type's mean.

    Cross-engine determinism: double summation is order-dependent, so
    mean/variance are built from EXACT integer sums of cent-quantized
    values (2dp inputs; sums are bigint), then the identical IEEE-754
    expression tree ((vc - s1/n) / sqrt(s2/n - (s1/n)^2), all-double)
    runs on identical inputs in both engines — bit-identical before the
    6dp round.  One aggregation on the 5-row type key, broadcast back
    onto the scan: a single fact-table pass at any scale."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        "value",
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("vc"),
    )
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vc").alias("s1"),
        F.sum(F.col("vc") * F.col("vc")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n").cast("double")
    ex2 = F.col("s2").cast("double") / F.col("n").cast("double")
    z = F.round(
        (F.col("vc").cast("double") - mean) / F.sqrt(ex2 - mean * mean), 6
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .select(
            "event_id", "event_type", "value", z.alias("z_score")
        )
        .filter(F.abs(F.col("z_score")) > 2.5)
    )


@query(
    "events_histogram",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE}
    SELECT event_type,
           CAST(floor(value / 10.0) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           CAST(ROUND(MIN(value) * 100) AS BIGINT) AS min_cents,
           CAST(ROUND(MAX(value) * 100) AS BIGINT) AS max_cents
    FROM events
    GROUP BY event_type, bucket
    """,
)
def events_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width value histogram per event_type (width-10 buckets) with
    exact per-bucket extrema — the distribution-profiling query behind
    every monitoring dashboard.  floor(value/10) is the same IEEE
    division+floor in both engines; extrema are reported as exact cent
    integers (MIN/MAX are order-insensitive, no float-sum discipline
    needed).  One partial+final aggregation on a bounded (type, bucket)
    key — the shuffle carries only the histogram, never rows."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type",
        F.expr("CAST(floor(value / 10.0) AS BIGINT)").alias("bucket"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("CAST(ROUND(MIN(value) * 100) AS BIGINT)").alias("min_cents"),
        F.expr("CAST(ROUND(MAX(value) * 100) AS BIGINT)").alias("max_cents"),
    )


@query(
    "events_dau_wau",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE},
    activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d
      FROM events
    ),
    days AS (SELECT DISTINCT d FROM activity),
    dau AS (
      SELECT d, COUNT(*) AS dau FROM activity GROUP BY d
    ),
    wau AS (
      SELECT days.d, COUNT(DISTINCT a.user_id) AS wau
      FROM days JOIN activity a
        ON a.d <= days.d AND a.d > days.d - INTERVAL 7 DAY
      GROUP BY days.d
    )
    SELECT dau.d AS day, dau.dau, wau.wau,
           CAST(ROUND(dau.dau * 1000000.0 / wau.wau) AS BIGINT) / 1e6
             AS stickiness
    FROM dau JOIN wau ON dau.d = wau.d
    """,
)
def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness per day — the engagement
    headline metric.  Rolling COUNT(DISTINCT) cannot ride a window
    frame (distinct state is not mergeable across frame slides), so the
    scalable spelling is the day-grid range join: distinct (user, day)
    activity — already aggregated, tiny — joined to the day grid on a
    bounded 7-day interval, then one distinct count per day.  The fact
    table is touched exactly once (the DISTINCT); everything after is
    |users|·|days| at worst.  Stickiness divides two exact integers in
    the identical IEEE tree on both engines, rounded 6dp."""
    ev = load_table(spark, sf_dir, "events")
    activity = (
        ev.select("user_id", F.date_trunc("day", F.col("ts")).alias("d"))
        .distinct()
    )
    days = activity.select("d").distinct()
    dau = activity.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    a = activity.select(F.col("user_id"), F.col("d").alias("ad"))
    wau = (
        F.broadcast(days)
        .join(
            a,
            (F.col("ad") <= F.col("d"))
            & (F.col("ad") > F.col("d") - F.expr("INTERVAL 7 DAYS")),
        )
        .groupBy("d")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        dau.join(wau, "d")
        .select(
            F.col("d").alias("day"),
            "dau",
            "wau",
            # tie-safe 6dp ratio (win_percentiles lesson, r8 sweep)
            (
                F.round(F.col("dau") * 1000000.0 / F.col("wau"))
                .cast("long")
                / 1e6
            ).alias("stickiness"),
        )
    )


@query(
    "events_rfm",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE},
    anchor AS (SELECT MAX(ts) AS now_ts FROM events),
    per_user AS (
      SELECT user_id,
             CAST(date_diff('day', MAX(ts), (SELECT now_ts FROM anchor))
                  AS BIGINT) AS recency_days,
             COUNT(*) AS frequency,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(24,8))), 2) AS DOUBLE)
               AS monetary
      FROM events GROUP BY user_id
    ),
    scored AS (
      SELECT *,
             CAST(ntile(4) OVER (ORDER BY recency_days, user_id) AS INTEGER)
               AS r_quartile,
             CAST(ntile(4) OVER (ORDER BY frequency DESC, user_id) AS INTEGER)
               AS f_quartile,
             CAST(ntile(4) OVER (ORDER BY monetary DESC, user_id) AS INTEGER)
               AS m_quartile
      FROM per_user
    )
    SELECT user_id, recency_days, frequency, monetary,
           r_quartile, f_quartile, m_quartile,
           concat(r_quartile, f_quartile, m_quartile) AS rfm_segment
    FROM scored
    """,
)
def events_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM user segmentation — the classic marketing-analytics cut:
    per user, days since last event (vs the corpus max timestamp, so
    the key is reproducible), event count, and exact-decimal spend;
    each dimension quartiled (1 = best) and concatenated into the
    '111'…'444' segment label.

    One shuffle on user_id does all three aggregates; the global max
    timestamp is a 1-row aggregate broadcast back (sub_scalar
    pattern); the ntile windows run over the AGGREGATED user table
    (post-reduction discipline) with user_id tiebreaks so the quartile
    boundaries are total-ordered and engine-identical."""
    ev = load_table(spark, sf_dir, "events")
    anchor = ev.agg(F.max("ts").alias("now_ts"))
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum(F.col("value").cast("decimal(24,8)")), 2)
            .cast("double")
            .alias("monetary"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "user_id",
            F.datediff("now_ts", "last_ts").cast("long").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    w_r = Window.orderBy("recency_days", "user_id")
    w_f = Window.orderBy(F.col("frequency").desc(), "user_id")
    w_m = Window.orderBy(F.col("monetary").desc(), "user_id")
    scored = per_user.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(4).over(w_r).alias("r_quartile"),
        F.ntile(4).over(w_f).alias("f_quartile"),
        F.ntile(4).over(w_m).alias("m_quartile"),
    )
    return scored.withColumn(
        "rfm_segment",
        F.concat("r_quartile", "f_quartile", "m_quartile"),
    )


@query(
    "events_attribution",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE},
    tagged AS (
      SELECT user_id, ts, event_id, event_type,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS conv_ts
      FROM events
    ),
    touches AS (
      SELECT user_id, conv_ts, ts, event_id, event_type
      FROM tagged
      WHERE event_type <> 'purchase' AND conv_ts IS NOT NULL
    ),
    sized AS (
      SELECT *,
             COUNT(*) OVER (PARTITION BY user_id, conv_ts) AS n_touches,
             row_number() OVER (PARTITION BY user_id, conv_ts
                                ORDER BY ts, event_id) AS rn_first,
             row_number() OVER (PARTITION BY user_id, conv_ts
                                ORDER BY ts DESC, event_id DESC) AS rn_last
      FROM touches
    )
    SELECT event_type AS channel,
           CAST(SUM(CASE WHEN rn_first = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS first_touch,
           CAST(SUM(CASE WHEN rn_last = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS last_touch,
           ROUND(SUM(CAST(ROUND(1000000.0 / n_touches) AS BIGINT)) / 1e6, 6)
             AS linear_credit
    FROM sized GROUP BY event_type
    """,
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch conversion attribution — first-touch, last-touch and
    linear credit per channel (event_type), the marketing-analytics
    workload every event warehouse runs: each non-purchase event is a
    "touch" attributed to the user's NEXT purchase.

    The touch→conversion assignment is ONE reverse running-min window
    over (user, ts DESC, event_id DESC) — the as-of-forward join
    expressed as a window so it shares a single shuffle+sort on the
    user key with the per-conversion counts and first/last row_numbers
    that follow (Exchange reuse: five window functions, one sort
    order family, one shuffle).  event_id breaks timestamp ties so the
    frame contents are a total order — identical in both engines.

    Linear credit (1/n per touch) is summed EXACTLY: each touch's share
    is snapped to integer micro-credits (ROUND(1e6/n) — the pagerank
    grid discipline) so the per-channel reduction is an order-free
    int64 sum, divided back out once at the end."""
    ev = load_table(spark, sf_dir, "events")
    w_rev = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).over(w_rev).alias("conv_ts"),
    )
    touches = tagged.filter(
        (F.col("event_type") != "purchase") & F.col("conv_ts").isNotNull()
    )
    grp = Window.partitionBy("user_id", "conv_ts")
    sized = touches.select(
        "event_type",
        F.count(F.lit(1)).over(grp).alias("n_touches"),
        F.row_number()
        .over(grp.orderBy("ts", "event_id"))
        .alias("rn_first"),
        F.row_number()
        .over(grp.orderBy(F.col("ts").desc(), F.col("event_id").desc()))
        .alias("rn_last"),
    )
    return sized.groupBy(F.col("event_type").alias("channel")).agg(
        F.sum(F.when(F.col("rn_first") == 1, 1).otherwise(0))
        .cast("long")
        .alias("first_touch"),
        F.sum(F.when(F.col("rn_last") == 1, 1).otherwise(0))
        .cast("long")
        .alias("last_touch"),
        F.round(
            F.sum(
                F.round(F.lit(1000000.0) / F.col("n_touches"), 0).cast("long")
            )
            / F.lit(1e6),
            6,
        ).alias("linear_credit"),
    )


@query(
    "events_sessionize",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE},
    ord AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT *,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM ord
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
    FROM sess GROUP BY user_id, session_idx
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCH sessionization — the gap-based session assignment every
    clickstream warehouse materializes (the batch twin of
    ``stream_session``'s session_window): a new session starts when a
    user is idle > 30 minutes; output is one row per session with event
    count, bounds, and exact microsecond duration.

    Classic lag→flag→running-sum spelling: both window phases share ONE
    (user_id) shuffle and one (ts, event_id) sort — event_id breaks
    timestamp ties so the running session index is a total order — and
    the final per-session agg reuses the same user-keyed partitioning.
    All values are timestamps/ints (duration in exact epoch micros);
    nothing floats.  At 100 TB: sessionization is the canonical
    "shuffle once by entity, sort by time" pass; per-user state is one
    timestamp, which is why the streaming twin's state also fits."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (F.col("ts") > prev_ts + F.expr("INTERVAL 30 MINUTES")),
        F.lit(1),
    ).otherwise(F.lit(0))
    sess = ev.withColumn("is_new", is_new).withColumn(
        "session_idx",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
            "duration_us"
        ),
    )


@query(
    "events_ab_test",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE},
    v AS (
      SELECT event_type,
             {_H_DUCK.format(x="concat('ab:', CAST(user_id AS VARCHAR))")} % 2
               AS variant,
             CAST(ROUND(value * 100) AS BIGINT) AS vc
      FROM events
    ),
    g AS (
      SELECT event_type, variant,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(vc) AS s1, SUM(vc * vc) AS s2
      FROM v GROUP BY event_type, variant
    ),
    w AS (
      SELECT a.event_type,
             a.n AS n_a, b.n AS n_b,
             CAST(ROUND(a.s1 * 10000.0 / a.n) AS BIGINT) / 1e6 AS mean_a,
             CAST(ROUND(b.s1 * 10000.0 / b.n) AS BIGINT) / 1e6 AS mean_b,
             (CAST(a.s2 AS DOUBLE) - CAST(a.s1 AS DOUBLE) * a.s1 / a.n)
               / (a.n - 1) / 10000.0 AS var_a,
             (CAST(b.s2 AS DOUBLE) - CAST(b.s1 AS DOUBLE) * b.s1 / b.n)
               / (b.n - 1) / 10000.0 AS var_b,
             CAST(a.s1 AS DOUBLE) / a.n / 100.0
               - CAST(b.s1 AS DOUBLE) / b.n / 100.0 AS diff
      FROM g a JOIN g b
        ON a.event_type = b.event_type AND a.variant = 0 AND b.variant = 1
    )
    SELECT event_type, n_a, n_b, mean_a, mean_b,
           ROUND(diff / sqrt(var_a / n_a + var_b / n_b), 6) AS z_score
    FROM w
    """,
)
def events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample A/B experiment readout per event_type: users are
    deterministically split 50/50 by the portable salted hash (same
    assignment discipline as llm_train_test_split — reproducible across
    runs, engines, partitionings), and each metric row reports group
    sizes, means, and the Welch z-score of the value difference.

    Exactness: per-event values are snapped to integer cents, so group
    (n, Σv, Σv²) are exact int64 sums — the ONLY float ops are the final
    mean/variance/z expressions, computed from identical integers by an
    identical tree in both engines and rounded 6dp.  Plan: one partial-
    aggregated (event_type, variant) hash-agg (10 rows), then a self-
    join of the tiny grouped table — shuffle volume is the group count,
    per-row work one hash per event.  At 100 TB this is the textbook
    map-side-combine aggregate."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.expr(
            "pmod("
            + _H_SPARK.format(x="concat('ab:', CAST(user_id AS STRING))")
            + ", 2)"
        ).alias("variant"),
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    g = v.groupBy("event_type", "variant").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("vc").alias("s1"),
        F.sum(F.col("vc") * F.col("vc")).alias("s2"),
    )
    a = g.filter(F.col("variant") == 0).select(
        "event_type",
        F.col("n").alias("n_a"),
        F.col("s1").alias("s1_a"),
        F.col("s2").alias("s2_a"),
    )
    b = g.filter(F.col("variant") == 1).select(
        F.col("event_type").alias("et_b"),
        F.col("n").alias("n_b"),
        F.col("s1").alias("s1_b"),
        F.col("s2").alias("s2_b"),
    )
    j = a.join(b, a["event_type"] == b["et_b"])
    mean_a = F.col("s1_a").cast("double") / F.col("n_a") / 100.0
    mean_b = F.col("s1_b").cast("double") / F.col("n_b") / 100.0
    var_a = (
        (F.col("s2_a").cast("double")
         - F.col("s1_a").cast("double") * F.col("s1_a") / F.col("n_a"))
        / (F.col("n_a") - 1) / 10000.0
    )
    var_b = (
        (F.col("s2_b").cast("double")
         - F.col("s1_b").cast("double") * F.col("s1_b") / F.col("n_b"))
        / (F.col("n_b") - 1) / 10000.0
    )
    return j.select(
        "event_type",
        "n_a",
        "n_b",
        # tie-safe: cents*1e6/(n*100) == cents*1e4/n snapped to int
        (F.round(F.col("s1_a") * 10000.0 / F.col("n_a")).cast("long") / 1e6)
        .alias("mean_a"),
        (F.round(F.col("s1_b") * 10000.0 / F.col("n_b")).cast("long") / 1e6)
        .alias("mean_b"),
        F.round(
            (mean_a - mean_b)
            / F.sqrt(var_a / F.col("n_a") + var_b / F.col("n_b")),
            6,
        ).alias("z_score"),
    )


@query(
    "events_cep",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE},
    seq AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS seq,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_clicks,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_purchases
      FROM events GROUP BY user_id
    )
    SELECT user_id, n_events, n_clicks, n_purchases, seq,
           CASE WHEN regexp_matches(seq, 'c[^e]*p') THEN 1 ELSE 0 END
             AS clean_conversion
    FROM seq
    """,
)
def events_cep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event-processing pattern match — the MATCH_RECOGNIZE /
    Flink-CEP workhorse a Kafka pipeline answers: per user, did a
    ``click`` lead to a ``purchase`` with NO intervening ``error``?

    Each user's events are folded (ordered by ``ts, event_id`` — a
    total order) into a string of event-type initials (c/e/p/s/v, all
    distinct), and the pattern is one regex ``c[^e]*p`` EXISTENCE test
    — existence (not match count or span) is deliberately the exported
    semantic because it is identical across Java regex and RE2-style
    engines; counts of greedy matches are not.  Everything else is
    exact integers.

    Plan: ONE (user_id) shuffle; the sequence fold is
    ``array_sort(collect_list(struct))`` → ``transform`` → join — all
    JVM codegen, no Python.  At 100 TB per-entity sequences are the
    irreducible state of CEP (same contract as events_pathing); the
    per-user string is bounded by per-user activity, not corpus size,
    and the streaming twin is session-state + NFA-step per event."""
    ev = load_table(spark, sf_dir, "events")
    folded = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "ts",
                            "event_id",
                            F.substring("event_type", 1, 1).alias("ch"),
                        )
                    )
                ),
                lambda x: x["ch"],
            ),
            "",
        ).alias("seq"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("n_clicks"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("n_purchases"),
    )
    return folded.select(
        "user_id",
        "n_events",
        "n_clicks",
        "n_purchases",
        "seq",
        F.when(F.col("seq").rlike("c[^e]*p"), 1)
        .otherwise(0)
        .alias("clean_conversion"),
    )


@query(
    "events_markov",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE},
    step AS (
      SELECT user_id, event_type AS curr,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ),
    pair AS (
      SELECT prev, curr, CAST(COUNT(*) AS BIGINT) AS n
      FROM step WHERE prev IS NOT NULL GROUP BY prev, curr
    )
    SELECT prev, curr, n,
           CAST(ROUND(n * 1000000.0
                      / SUM(n) OVER (PARTITION BY prev)) AS BIGINT)
             / 1e6 AS prob
    FROM pair
    """,
)
def events_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over the event stream: for
    every (prev_type -> curr_type) step within a user's timeline, the
    exact transition count and the row-normalized probability — the
    next-event model behind product recommendations and anomaly
    scoring on clickstreams.

    Exactness: counts are int64; the ONLY float op is the final
    count/row-total division, computed from identical integers by an
    identical expression both engines, rounded 6dp.  Plan: one
    (user_id) shuffle + (ts, event_id) sort for the lag, then a hash
    agg that collapses to |types|^2 <= 25 rows; the normalizing window
    runs on that tiny grouped table.  At 100 TB the lag pass is the
    same shuffle sessionization already pays, and the output is
    constant-size."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    step = ev.select(
        F.col("event_type").alias("curr"),
        F.lag("event_type").over(w).alias("prev"),
    ).filter(F.col("prev").isNotNull())
    pair = step.groupBy("prev", "curr").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return pair.select(
        "prev",
        "curr",
        "n",
        # tie-safe 6dp ratio (win_percentiles lesson, r8 sweep)
        (
            F.round(
                F.col("n")
                * 1000000.0
                / F.sum("n").over(Window.partitionBy("prev"))
            ).cast("long")
            / 1e6
        ).alias("prob"),
    )


@query(
    "events_scd2",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE},
    marked AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN lag(event_type) OVER w IS NULL
                    OR event_type <> lag(event_type) OVER w
                  THEN 1 ELSE 0 END AS is_change
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    regime AS (
      SELECT *,
             SUM(is_change) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS version
      FROM marked
    ),
    dim AS (
      SELECT user_id, CAST(version AS BIGINT) AS version,
             event_type AS state,
             MIN(ts) AS valid_from,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM regime GROUP BY user_id, version, event_type
    )
    SELECT user_id, version, state, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY version) AS valid_to,
           CASE WHEN lead(valid_from) OVER (PARTITION BY user_id
                                            ORDER BY version) IS NULL
                THEN 1 ELSE 0 END AS is_current,
           n_events
    FROM dim
    """,
)
def events_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2 build from a changelog — the
    Debezium/Kafka-Connect pattern: collapse each user's event stream
    into versioned state intervals (state = event_type run), each row
    carrying ``valid_from`` / ``valid_to`` (NULL = open) and an
    ``is_current`` flag.

    Classic change-flag -> running-sum -> per-regime collapse -> lead()
    interval chaining.  All three window phases and the regime agg
    share ONE (user_id) shuffle (the version window's sort is a prefix
    reuse).  Values are timestamps and int64 only — nothing floats.
    At 100 TB this is the standard CDC-to-dimension compaction: state
    per user is one (type, ts) pair, and the output shrinks to the
    number of CHANGES, not events — exactly why warehouses store SCD2
    instead of raw logs."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    marked = ev.withColumn(
        "is_change",
        F.when(
            prev.isNull() | (F.col("event_type") != prev), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    regime = marked.withColumn(
        "version",
        F.sum("is_change")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long"),
    )
    dim = regime.groupBy(
        "user_id", "version", F.col("event_type").alias("state")
    ).agg(
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    wv = Window.partitionBy("user_id").orderBy("version")
    valid_to = F.lead("valid_from").over(wv)
    return dim.select(
        "user_id",
        "version",
        "state",
        "valid_from",
        valid_to.alias("valid_to"),
        F.when(valid_to.isNull(), 1).otherwise(0).alias("is_current"),
        "n_events",
    )


@query(
    "events_cohort_ltv",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE},
    base AS (
      SELECT user_id, ts,
             CAST(ROUND(value * 100) AS BIGINT) AS vc,
             date_trunc('week', MIN(ts) OVER (PARTITION BY user_id))
               AS cohort_week
      FROM events
    ),
    staged AS (
      SELECT cohort_week, user_id, vc,
             CAST(date_diff('day', cohort_week,
                            date_trunc('week', ts)) / 7 AS BIGINT)
               AS week_offset
      FROM base
    ),
    g AS (
      SELECT cohort_week, week_offset,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active,
             CAST(SUM(vc) AS BIGINT) AS spend_cents
      FROM staged GROUP BY cohort_week, week_offset
    ),
    size_ AS (
      SELECT cohort_week,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      FROM staged GROUP BY cohort_week
    )
    SELECT g.cohort_week, g.week_offset, g.n_active, s.n_users,
           CAST(SUM(g.spend_cents) OVER (PARTITION BY g.cohort_week
                                         ORDER BY g.week_offset
                                         ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cum_spend_cents,
           CAST(ROUND(CAST(SUM(g.spend_cents)
                        OVER (PARTITION BY g.cohort_week
                              ORDER BY g.week_offset
                              ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                      * 10000.0 / s.n_users) AS BIGINT) / 1e6 AS ltv
    FROM g JOIN size_ s ON s.cohort_week = g.cohort_week
    """,
)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves — the growth-analytics readout on
    top of retention: users are cohorted by first-seen WEEK, and each
    (cohort, week-offset) row carries active users, exact cumulative
    spend, and cumulative LTV per cohort user.

    Exactness: spend snaps to integer cents at the source, offsets are
    integer week arithmetic on date_trunc'd timestamps, the running
    sum is int64, and the only float is the final rounded
    LTV division.  Plan: the first-seen stamp is a min-over-user
    window (one user_id shuffle — no self-join); raw rows then
    pre-aggregate ONCE on (cohort, offset, user) so the active-user
    and cohort-size DISTINCTs become plain counts over the shrunk
    per-user table — no countDistinct Expand ever touches raw rows —
    and the cohort size falls out of the SAME aggregate (offset-0
    actives = the cohort, since first events define the cohort week).
    The cumulative window + cohort-size join run over cohorts × horizon
    rows.  At 100 TB the user window is sessionization's shuffle and
    the (cohort, offset, user) agg map-side-combines on user-clustered
    input; everything after is constant-sized."""
    ev = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id")
    base = ev.select(
        "user_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("vc"),
        F.date_trunc("week", F.min("ts").over(wu)).alias("cohort_week"),
    )
    staged = base.withColumn(
        "week_offset",
        (
            F.datediff(
                F.date_trunc("week", F.col("ts")), F.col("cohort_week")
            )
            / 7
        ).cast("long"),
    )
    per_user = staged.groupBy(
        "cohort_week", "week_offset", "user_id"
    ).agg(F.sum("vc").alias("uvc"))
    # g is consumed TWICE (curve rows + the offset-0 size derivation);
    # without truncation Catalyst recomputes the raw scan + min-window
    # per branch (the graph_triangles lesson).  localCheckpoint pins the
    # cohorts x horizon table — a few rows.
    g = (
        per_user.groupBy("cohort_week", "week_offset")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_active"),
            F.sum("uvc").cast("long").alias("spend_cents"),
        )
        .localCheckpoint(eager=False)
    )
    # cohort size = n_active at offset 0: every user's FIRST event lands
    # in their own cohort week by construction, so the week-0 active set
    # IS the cohort — deriving size from g avoids a second raw scan +
    # min-window pass (Catalyst does not share common subplans; the
    # two-branch spelling scanned events twice, plan-pinned below).
    # The oracle keeps the independent COUNT(DISTINCT) spelling, so the
    # identity is hash-checked, not assumed.
    size = g.filter(F.col("week_offset") == 0).select(
        "cohort_week", F.col("n_active").alias("n_users")
    )
    wc = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        g.join(size, "cohort_week")
        .withColumn(
            "cum_spend_cents", F.sum("spend_cents").over(wc).cast("long")
        )
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            "n_users",
            "cum_spend_cents",
            # tie-safe: cents*1e6/(users*100) == cents*1e4/users snapped
            (
                F.round(
                    F.col("cum_spend_cents").cast("double")
                    * 10000.0
                    / F.col("n_users")
                ).cast("long")
                / 1e6
            ).alias("ltv"),
        )
    )


@query(
    "events_entropy",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE},
    c AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY user_id, event_type
    ),
    terms AS (
      SELECT user_id, event_type, c,
             CAST(ROUND(c * ln(c) * 1e9) AS BIGINT) AS clnc9
      FROM c
    ),
    agg AS (
      SELECT user_id,
             CAST(SUM(c) AS BIGINT) AS n_events,
             CAST(COUNT(*) AS BIGINT) AS n_types,
             CAST(SUM(clnc9) AS BIGINT) AS s9
      FROM terms GROUP BY user_id
    )
    SELECT user_id, n_events, n_types,
           CAST(ROUND((CAST(ROUND(ln(n_events) * 1e9) AS BIGINT) * n_events
                       - s9) / (n_events * 1000.0)) AS BIGINT) / 1e6
             AS entropy,
           ROUND(((CAST(ROUND(ln(n_events) * 1e9) AS BIGINT)
                   - CAST(s9 AS DOUBLE) / n_events) / 1e9)
                 / NULLIF(ln(n_types), 0.0), 6) AS entropy_norm
    FROM agg
    """,
)
def events_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Shannon ENTROPY of the event-type distribution — the
    behavioral-diversity score (bots and single-purpose scripts sit
    near 0; broad organic users near ln(n_types)) used for cohorting
    and abuse triage.

    Exactness: H = ln n − (Σ c·ln c)/n over exact integer counts;
    every transcendental is snapped to the 1e-9 grid BEFORE entering a
    reduction (c·ln c per (user, type) row, ln n once per user — the
    llm_lm_score discipline), so the only cross-engine float ops after
    snapping are one division and one subtraction in fixed order.
    entropy_norm divides by ln(n_types) with a NULLIF guard: a
    single-type user has zero entropy and an UNDEFINED normalization —
    NULL, not a divide-by-zero Inf (the quality-ratios lesson).

    Plan: one (user, type) hash-agg over raw events — map-side
    combine-heavy since the type alphabet is tiny — then a per-user
    re-aggregation of ≤|alphabet| rows.  At 100 TB both aggs shuffle
    rows ∝ users × types, never ∝ events."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    terms = c.select(
        "user_id",
        F.round(F.col("c") * F.log("c") * 1e9).cast("long").alias("clnc9"),
        "c",
    )
    agg = terms.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum("clnc9").cast("long").alias("s9"),
    )
    ln_n9 = F.round(F.log("n_events") * 1e9).cast("long")
    h = (ln_n9 - F.col("s9").cast("double") / F.col("n_events")) / 1e9
    # tie-safe entropy: H*1e6 = (ln_n9*n - s9)/(n*1000) is an integer
    # ratio — snap it (win_percentiles lesson); entropy_norm's ln
    # denominator is irrational, so exact 6dp ties cannot occur there
    h6 = (
        F.round(
            (ln_n9 * F.col("n_events") - F.col("s9"))
            / (F.col("n_events") * 1000.0)
        ).cast("long")
        / 1e6
    )
    ln_t = F.log("n_types")
    return agg.select(
        "user_id",
        "n_events",
        "n_types",
        h6.alias("entropy"),
        F.round(h / F.when(ln_t != 0.0, ln_t), 6).alias("entropy_norm"),
    )


@query(
    "events_audience_overlap",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE},
    du AS (SELECT DISTINCT event_type, user_id FROM events),
    sizes AS (SELECT event_type, COUNT(*) AS n FROM du GROUP BY 1),
    shared AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS n_shared
      FROM du a JOIN du b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT s.type_a, s.type_b, sa.n AS n_a, sb.n AS n_b, s.n_shared,
           CAST(ROUND(s.n_shared * 1000000.0
                      / (sa.n + sb.n - s.n_shared)) AS BIGINT) / 1e6
             AS jaccard
    FROM shared s
    JOIN sizes sa ON sa.event_type = s.type_a
    JOIN sizes sb ON sb.event_type = s.type_b
    """,
)
def events_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap matrix: for every pair of event types, how many
    users did both, and the Jaccard of the two audiences — the
    cross-sell / cannibalization question every growth team asks.

    Shape: distinct (type, user) once — that dedup is the only pass
    over raw events — then a self-equi-join ON user_id.  The fan-out is
    bounded by the alphabet: each user contributes at most
    |types|·(|types|−1)/2 pairs (≤10 here), so the join output is
    O(users), never O(events²).  Audience sizes re-join via two
    broadcast hash joins on the ≤|types|-row sizes table.  The Jaccard
    ratio uses the tie-safe integer snap (k·10⁶/q → ROUND → BIGINT →
    /1e6; the r8 systematic pass) since |A∪B| can hit 2^a·5^b.  At
    100 TB the distinct is the cost center (one shuffle of the
    (type,user) projection); everything after runs on user-cardinality
    data."""
    ev = load_table(spark, sf_dir, "events")
    # user-cardinality table feeds sizes AND both self-join sides;
    # unpinned, each consumer re-ran the events scan + distinct (r8
    # multi-scan sweep — the tpch_q15 disease)
    du = (
        ev.select("event_type", "user_id")
        .distinct()
        .localCheckpoint(eager=False)
    )
    sizes = du.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = du.select(F.col("event_type").alias("type_a"), "user_id")
    b = du.select(F.col("event_type").alias("type_b"), "user_id")
    shared = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        shared.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_shared",
            (
                F.round(
                    F.col("n_shared")
                    * 1000000.0
                    / (F.col("n_a") + F.col("n_b") - F.col("n_shared"))
                ).cast("long")
                / 1e6
            ).alias("jaccard"),
        )
    )


@query(
    "events_ab_srm",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE},
    du AS (
      SELECT DISTINCT event_type, user_id,
             {_H_DUCK.format(x="concat('ab:', CAST(user_id AS VARCHAR))")} % 2
               AS variant
      FROM events
    ),
    g AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS users_a,
             CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS users_b
      FROM du GROUP BY event_type
    )
    SELECT event_type, users_a, users_b,
           CAST(ROUND((users_a - users_b) * (users_a - users_b) * 1000000.0
                      / (users_a + users_b)) AS BIGINT) / 1e6 AS chi2,
           (users_a - users_b) * (users_a - users_b) * 1000000.0
             / (users_a + users_b) > 3841438.0 AS srm
    FROM g
    """,
)
def events_ab_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guard for the ``events_ab_test``
    experiment: per event_type, the DISTINCT-USER counts landing in
    each arm of the same salted-hash 50/50 split, the 1-dof chi-square
    (nₐ−n_b)²/(nₐ+n_b) against the expected equal split, and the
    srm flag at the conventional p<0.05 critical value 3.8415 — the
    first sanity check any experimentation platform runs, because a
    mismatched split invalidates the readout before any metric is
    looked at.

    Exactness: arm counts are exact int64 (distinct users, same hash
    assignment as the readout key — SRM guards THAT experiment); the
    chi-square is an integer-ratio, so it uses the tie-safe 10⁶ snap,
    and the flag compares the UNSNAPPED scaled integers (d²·10⁶ vs
    3 841 438·(nₐ+n_b) — exact, no boundary ambiguity).  One distinct
    shrink of (type, user) is the only events-scale pass."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        "event_type",
        "user_id",
        (
            F.expr(_H_SPARK.format(x="concat('ab:', CAST(user_id AS STRING))"))
            % 2
        ).alias("variant"),
    ).distinct()
    g = du.groupBy("event_type").agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("long")
        .alias("users_a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .cast("long")
        .alias("users_b"),
    )
    d2 = (F.col("users_a") - F.col("users_b")) * (
        F.col("users_a") - F.col("users_b")
    )
    tot = F.col("users_a") + F.col("users_b")
    return g.select(
        "event_type",
        "users_a",
        "users_b",
        (F.round(d2 * 1000000.0 / tot).cast("long") / 1e6).alias("chi2"),
        (d2 * 1000000.0 / tot > 3841438.0).alias("srm"),
    )


# CUPED shared float fragments: every double-producing expression is ONE
# string evaluated verbatim by both engines (Spark F.expr / DuckDB CTE),
# so the float trees are identical by construction — the inputs are exact
# per-variant int64 sums, so cross-engine equality reduces to identical
# association, which sharing the string guarantees.  Stages because later
# expressions reference earlier ones by column name.
_CUPED_S1 = {
    "theta": (
        "(CAST(sxy_a + sxy_b AS DOUBLE)"
        " - CAST(sx_a + sx_b AS DOUBLE) * (sy_a + sy_b) / (n_a + n_b))"
        " / (CAST(sx2_a + sx2_b AS DOUBLE)"
        " - CAST(sx_a + sx_b AS DOUBLE) * (sx_a + sx_b) / (n_a + n_b))"
    ),
    "mxg": "CAST(sx_a + sx_b AS DOUBLE) / (n_a + n_b)",
}
_CUPED_S2 = {
    "my_a": "CAST(sy_a AS DOUBLE) / n_a",
    "my_b": "CAST(sy_b AS DOUBLE) / n_b",
    "madj_a": (
        "CAST(sy_a AS DOUBLE) / n_a"
        " - theta * (CAST(sx_a AS DOUBLE) / n_a - mxg)"
    ),
    "madj_b": (
        "CAST(sy_b AS DOUBLE) / n_b"
        " - theta * (CAST(sx_b AS DOUBLE) / n_b - mxg)"
    ),
    "var_y_a": (
        "(CAST(sy2_a AS DOUBLE) - CAST(sy_a AS DOUBLE) * sy_a / n_a)"
        " / (n_a - 1)"
    ),
    "var_y_b": (
        "(CAST(sy2_b AS DOUBLE) - CAST(sy_b AS DOUBLE) * sy_b / n_b)"
        " / (n_b - 1)"
    ),
    "cov_a": (
        "(CAST(sxy_a AS DOUBLE) - CAST(sx_a AS DOUBLE) * sy_a / n_a)"
        " / (n_a - 1)"
    ),
    "cov_b": (
        "(CAST(sxy_b AS DOUBLE) - CAST(sx_b AS DOUBLE) * sy_b / n_b)"
        " / (n_b - 1)"
    ),
    "var_x_a": (
        "(CAST(sx2_a AS DOUBLE) - CAST(sx_a AS DOUBLE) * sx_a / n_a)"
        " / (n_a - 1)"
    ),
    "var_x_b": (
        "(CAST(sx2_b AS DOUBLE) - CAST(sx_b AS DOUBLE) * sx_b / n_b)"
        " / (n_b - 1)"
    ),
}
_CUPED_S3 = {
    "var_adj_a": "var_y_a - 2 * theta * cov_a + theta * theta * var_x_a",
    "var_adj_b": "var_y_b - 2 * theta * cov_b + theta * theta * var_x_b",
}
_CUPED_OUT = {
    "theta_hat": "ROUND(theta, 6)",
    "diff_raw": "ROUND((my_a - my_b) / 100.0, 6)",
    "diff_cuped": "ROUND((madj_a - madj_b) / 100.0, 6)",
    "z_raw": "ROUND((my_a - my_b) / sqrt(var_y_a / n_a + var_y_b / n_b), 6)",
    "z_cuped": (
        "ROUND((madj_a - madj_b)"
        " / sqrt(var_adj_a / n_a + var_adj_b / n_b), 6)"
    ),
    "var_reduction": (
        "ROUND(1.0 - (var_adj_a + var_adj_b) / (var_y_a + var_y_b), 6)"
    ),
}


def _cuped_stage_sql(stage: dict[str, str], carry: list[str]) -> str:
    keep = ", ".join(carry)
    new = ", ".join(f"{e} AS {k}" for k, e in stage.items())
    return f"SELECT {keep}, {new}"


_CUPED_INTS = [
    "n_a", "n_b", "sx_a", "sx_b", "sy_a", "sy_b",
    "sxy_a", "sxy_b", "sx2_a", "sx2_b", "sy2_a", "sy2_b",
]


@query(
    "events_ab_cuped",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE},
    b AS (
      SELECT (CAST(epoch_us(MIN(ts)) AS BIGINT)
              + CAST(epoch_us(MAX(ts)) AS BIGINT)) // 2 AS mid
      FROM events
    ),
    u AS (
      SELECT user_id,
             {_H_DUCK.format(x="concat('ab:', CAST(user_id AS VARCHAR))")} % 2
               AS variant,
             CAST(SUM(CASE WHEN epoch_us(ts) < b.mid
                           THEN CAST(ROUND(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS x,
             CAST(SUM(CASE WHEN epoch_us(ts) >= b.mid
                           THEN CAST(ROUND(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS y,
             CAST(SUM(CASE WHEN epoch_us(ts) >= b.mid THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_exp
      FROM events, b
      GROUP BY user_id, b.mid
      HAVING SUM(CASE WHEN epoch_us(ts) >= b.mid THEN 1 ELSE 0 END) > 0
    ),
    g AS (
      SELECT variant,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sx2,
             CAST(SUM(y * y) AS BIGINT) AS sy2
      FROM u GROUP BY variant
    ),
    w AS (
      SELECT a.n AS n_a, b.n AS n_b,
             a.sx AS sx_a, b.sx AS sx_b,
             a.sy AS sy_a, b.sy AS sy_b,
             a.sxy AS sxy_a, b.sxy AS sxy_b,
             a.sx2 AS sx2_a, b.sx2 AS sx2_b,
             a.sy2 AS sy2_a, b.sy2 AS sy2_b
      FROM g a JOIN g b ON a.variant = 0 AND b.variant = 1
    ),
    s1 AS ({_cuped_stage_sql(_CUPED_S1, _CUPED_INTS)} FROM w),
    s2 AS ({_cuped_stage_sql(_CUPED_S2, _CUPED_INTS + ["theta", "mxg"])}
           FROM s1),
    s3 AS ({_cuped_stage_sql(
        _CUPED_S3,
        _CUPED_INTS + ["theta", "my_a", "my_b", "madj_a", "madj_b",
                       "var_y_a", "var_y_b"])} FROM s2)
    {_cuped_stage_sql(_CUPED_OUT, ["n_a", "n_b"])} FROM s3
    """,
)
def events_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced readout of the ``events_ab_test``
    experiment (Deng et al., WSDM'13): the event span is cut at its
    midpoint into a pre-period and an experiment period; each user's
    pre-period spend X becomes the control covariate for their
    experiment spend Y.  theta = cov(X,Y)/var(X) is fitted pooled
    across both arms (the unbiased-under-randomization choice), and
    the readout reports the raw and the CUPED-adjusted treatment
    effect, both z-scores, and the achieved variance reduction —
    the standard way an experimentation platform doubles its
    effective sample size without running longer.

    Exactness: per-user X/Y are exact int64 cent sums; per-arm
    (n, ΣX, ΣY, ΣXY, ΣX², ΣY²) are exact int64; every downstream
    double (theta, adjusted means, variances, z) is produced by ONE
    expression string shared verbatim between the Spark plan and the
    DuckDB oracle (`_CUPED_S1..S3/_CUPED_OUT`), so both engines run
    the identical float tree over identical integers and round 6dp.

    Plan/scale: one events-scan aggregate keyed on user_id (map-side
    combined), one 2-row aggregate on variant, then scalar algebra on
    a single row — the adjustment never materializes per-user adjusted
    values, so the CUPED pass costs exactly what the plain readout
    costs.  The midpoint bound is a 1-row broadcast.  At fixture
    scales the int products are bounded (max per-user cents ~5.4e5 →
    Σxy ≲ 1e15 « 2^63); at 100 TB route the moment sums through
    DECIMAL(38,0) (functions/numeric.dsum discipline)."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        (
            (F.unix_micros(F.min("ts")) + F.unix_micros(F.max("ts")))
            / F.lit(2)
        ).cast("long").alias("mid")
    )
    vc = F.round(F.col("value") * 100).cast("long")
    us = F.unix_micros(F.col("ts"))
    u = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id", "mid")
        .agg(
            F.sum(F.when(us < F.col("mid"), vc).otherwise(F.lit(0)))
            .cast("long")
            .alias("x"),
            F.sum(F.when(us >= F.col("mid"), vc).otherwise(F.lit(0)))
            .cast("long")
            .alias("y"),
            F.sum(F.when(us >= F.col("mid"), 1).otherwise(0))
            .cast("long")
            .alias("n_exp"),
        )
        .filter(F.col("n_exp") > 0)
        .select(
            (
                F.expr(
                    _H_SPARK.format(x="concat('ab:', CAST(user_id AS STRING))")
                )
                % 2
            ).alias("variant"),
            "x",
            "y",
        )
    )
    g = (
        u.groupBy("variant")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sx2"),
            F.sum(F.col("y") * F.col("y")).cast("long").alias("sy2"),
        )
        # the 2-row moment table feeds BOTH variant branches; unpinned,
        # each branch re-ran the full scan + user aggregate (r8 plan
        # audit batch 3 — the tpch_q15 disease)
        .localCheckpoint(eager=False)
    )
    a = g.filter(F.col("variant") == 0).select(
        *[F.col(c).alias(f"{c}_a") for c in ("n", "sx", "sy", "sxy", "sx2", "sy2")]
    )
    b = g.filter(F.col("variant") == 1).select(
        *[F.col(c).alias(f"{c}_b") for c in ("n", "sx", "sy", "sxy", "sx2", "sy2")]
    )
    w = a.crossJoin(F.broadcast(b))
    s1 = w.selectExpr(
        *_CUPED_INTS, *[f"{e} AS {k}" for k, e in _CUPED_S1.items()]
    )
    s2 = s1.selectExpr(
        *_CUPED_INTS, "theta", "mxg",
        *[f"{e} AS {k}" for k, e in _CUPED_S2.items()],
    )
    s3 = s2.selectExpr(
        *_CUPED_INTS, "theta", "my_a", "my_b", "madj_a", "madj_b",
        "var_y_a", "var_y_b",
        *[f"{e} AS {k}" for k, e in _CUPED_S3.items()],
    )
    return s3.selectExpr(
        "n_a", "n_b", *[f"{e} AS {k}" for k, e in _CUPED_OUT.items()]
    )


@query(
    "events_conversion_lag",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE},
    vp AS (
      SELECT user_id, ts, event_type,
             MIN(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id) AS fv
      FROM events WHERE event_type IN ('view', 'purchase')
    ),
    u AS (
      SELECT user_id, MIN(fv) AS fv,
             MIN(CASE WHEN event_type = 'purchase' AND ts > fv
                      THEN ts END) AS fp
      FROM vp GROUP BY 1
    )
    SELECT CAST(date_trunc('day', fv) AS TIMESTAMP) AS cohort_day,
           CAST(COUNT(*) AS BIGINT) AS n_viewers,
           CAST(COUNT(fp) AS BIGINT) AS n_converted,
           CAST(quantile_cont(epoch_us(fp) - epoch_us(fv), 0.5) * 2
                AS BIGINT) AS p50_lag2_us,
           MAX(epoch_us(fp) - epoch_us(fv)) AS max_lag_us,
           MIN(epoch_us(fp) - epoch_us(fv)) AS min_lag_us
    FROM u WHERE fv IS NOT NULL
    GROUP BY 1
    """,
)
def events_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch conversion LATENCY by acquisition cohort — the
    question events_funnel's step counts don't answer: of the users
    who first viewed on day D, how many converted and how long did
    conversion take (median / min / max lag)?  This is the
    time-to-value readout every growth dashboard pairs with retention.

    Semantics pinned precisely: fv = the user's FIRST view, fp = the
    first purchase STRICTLY AFTER fv (a purchase before any view is
    pre-attribution noise and doesn't count — the same first-touch
    rule events_attribution uses).  Lags are exact epoch microseconds
    (int64); the median ships DOUBLED (2·quantile, the ts_outlier_mad
    discipline) so even-n interpolation midpoints stay exact int64
    cross-engine.

    Plan shape: the fv window and the per-user aggregate share ONE
    (user_id) hash shuffle — Catalyst reuses the window's exchange for
    the groupBy because the keys match; the cohort rollup then reduces
    users → days (tiny).  At 100 TB this is the canonical two-level
    funnel reduction: events → one row per user (shuffle on the entity
    key, skew-free since per-user event counts are bounded) → one row
    per day; no join ever touches the raw event stream."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    w = Window.partitionBy("user_id")
    vp = ev.withColumn(
        "fv",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
    )
    u = vp.groupBy("user_id").agg(
        F.min("fv").alias("fv"),
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") > F.col("fv")),
                F.col("ts"),
            )
        ).alias("fp"),
    )
    lag = F.unix_micros(F.col("fp")) - F.unix_micros(F.col("fv"))
    return (
        u.filter(F.col("fv").isNotNull())
        .withColumn("lag_us", lag)
        .groupBy(F.date_trunc("day", F.col("fv")).alias("cohort_day"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_viewers"),
            F.count("lag_us").cast("long").alias("n_converted"),
            F.expr("CAST(percentile(lag_us, 0.5) * 2 AS BIGINT)").alias(
                "p50_lag2_us"
            ),
            F.max("lag_us").alias("max_lag_us"),
            F.min("lag_us").alias("min_lag_us"),
        )
    )


@query(
    "events_did",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE},
    cells AS (
      SELECT CAST(user_id % 2 AS INTEGER) AS treated,
             CAST(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END
                  AS INTEGER) AS post,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL
    ),
    m AS (
      SELECT treated, post,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS sum_cents,
             CAST(ROUND(1000000.0 * SUM(cents) / COUNT(*)) AS BIGINT)
               AS mean_ppm
      FROM cells GROUP BY treated, post
    )
    SELECT treated, post, n, sum_cents, mean_ppm,
           CAST((SELECT
                   (CAST(ROUND(1000000.0 * SUM(CASE WHEN treated=1 AND post=1 THEN cents END)
                         / COUNT(CASE WHEN treated=1 AND post=1 THEN 1 END)) AS BIGINT)
                  - CAST(ROUND(1000000.0 * SUM(CASE WHEN treated=1 AND post=0 THEN cents END)
                         / COUNT(CASE WHEN treated=1 AND post=0 THEN 1 END)) AS BIGINT))
                  - (CAST(ROUND(1000000.0 * SUM(CASE WHEN treated=0 AND post=1 THEN cents END)
                         / COUNT(CASE WHEN treated=0 AND post=1 THEN 1 END)) AS BIGINT)
                  - CAST(ROUND(1000000.0 * SUM(CASE WHEN treated=0 AND post=0 THEN cents END)
                         / COUNT(CASE WHEN treated=0 AND post=0 THEN 1 END)) AS BIGINT))
                 FROM cells) AS BIGINT) AS did_ppm
    FROM m ORDER BY treated, post
    """,
)
def events_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences readout: deterministic treatment
    assignment (user parity — production uses the salted-hash split),
    pre/post cut at the span midpoint, per-cell exact spend means, and
    the DiD estimate (Δtreated − Δcontrol) attached to every cell row —
    the causal-impact companion of events_ab_cuped (which de-noises a
    randomized A/B; DiD handles the NON-randomized rollout where groups
    differ at baseline and only the trend difference identifies the
    effect).

    Exactness: cell sums are exact cent ints; each mean is ONE
    round-of-identical-IEEE-quotient onto the ppm grid, and the DiD is
    integer arithmetic over the four snapped means — no compounded
    float ops cross engines.

    Scale: one pass, one 4-group map-combined aggregate; the estimate
    is driver-side arithmetic on 4 rows broadcast back (the
    sub_scalar_corr 1-row-join pattern, never a second fact scan)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cells = ev.select(
        (F.col("user_id") % 2).cast("int").alias("treated"),
        (F.col("ts") >= F.lit("2024-01-16").cast("timestamp"))
        .cast("int")
        .alias("post"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    m = cells.groupBy("treated", "post").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("sum_cents"),
        F.round(1000000.0 * F.sum("cents") / F.count(F.lit(1)))
        .cast("bigint")
        .alias("mean_ppm"),
    )
    # scalar DiD over the 4 snapped cell means, broadcast back onto them
    did = m.agg(
        (
            (
                F.sum(F.when((F.col("treated") == 1) & (F.col("post") == 1), F.col("mean_ppm")))
                - F.sum(F.when((F.col("treated") == 1) & (F.col("post") == 0), F.col("mean_ppm")))
            )
            - (
                F.sum(F.when((F.col("treated") == 0) & (F.col("post") == 1), F.col("mean_ppm")))
                - F.sum(F.when((F.col("treated") == 0) & (F.col("post") == 0), F.col("mean_ppm")))
            )
        )
        .cast("bigint")
        .alias("did_ppm")
    )
    return (
        m.crossJoin(F.broadcast(did))
        .select("treated", "post", "n", "sum_cents", "mean_ppm", "did_ppm")
        .orderBy("treated", "post")
    )


@query(
    "events_survival",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE},
    u AS (
      SELECT user_id,
             MIN(epoch_us(ts)) AS t0_us,
             MAX(epoch_us(ts)) AS tlast_us
      FROM events GROUP BY user_id
    ),
    conv AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS conv_us
      FROM events e JOIN u USING (user_id)
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > u.t0_us
      GROUP BY e.user_id
    ),
    per_user AS (
      SELECT u.user_id,
             CASE WHEN c.conv_us IS NOT NULL THEN 1 ELSE 0 END AS observed,
             CAST((COALESCE(c.conv_us, u.tlast_us) - u.t0_us)
                  // 3600000000 AS BIGINT) AS duration_h
      FROM u LEFT JOIN conv c USING (user_id)
    ),
    buckets AS (
      SELECT duration_h,
             CAST(SUM(observed) AS BIGINT) AS n_events,
             CAST(SUM(1 - observed) AS BIGINT) AS n_censored
      FROM per_user GROUP BY duration_h
    )
    SELECT duration_h, n_events, n_censored,
           CAST(SUM(n_events + n_censored) OVER
                  (ORDER BY duration_h DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS n_at_risk,
           CAST(ROUND(n_events * 1000000.0 /
                SUM(n_events + n_censored) OVER
                  (ORDER BY duration_h DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                AS BIGINT) / 1e6 AS hazard
    FROM buckets
    """,
)
def events_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival/hazard table for time-to-conversion: per
    user, the duration (whole hours) from their FIRST event to their
    first STRICTLY-LATER purchase; users who never convert are
    right-CENSORED at their last observed event.  Output is the KM
    life table per duration bucket — events, censored, at-risk count
    (everyone whose observed or censored duration is ≥ t), and the
    discrete hazard d_t/n_t — the retention-curve / time-to-value
    analysis a product pipeline runs next to funnel and cohort LTV.

    Exactness: all counts are exact integers; the only ratio is the
    hazard, snapped on the 1e-6 integer grid (round of an exact-int
    rational computed identically in both engines — the jaccard
    discipline).  The KM survival PRODUCT is deliberately NOT emitted:
    a cross-engine cumulative float product is ordering-fragile, while
    (d_t, n_t) determine it exactly for any downstream consumer.

    Plan: ONE fact scan — a user_id window computes each user's origin
    in place, and the per-user aggregate REUSES the window's exchange
    (same partitioning key, no second shuffle); the life table itself
    is ≤ horizon-hours rows — bounded METADATA, so the single-partition
    reverse-cumsum window is a driver-sized frame, not a data-sized
    one.  At 100 TB only that one user-keyed pass touches the fact
    table (plan-pinned single Scan)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
    )
    wu = Window.partitionBy("user_id")
    e2 = ev.select(
        "user_id",
        "us",
        "event_type",
        F.min("us").over(wu).alias("t0_us"),
    )
    per_user_raw = e2.groupBy("user_id").agg(
        F.min("t0_us").alias("t0_us"),
        F.max("us").alias("tlast_us"),
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("us") > F.col("t0_us")),
                F.col("us"),
            )
        ).alias("conv_us"),
    )
    per_user = per_user_raw.select(
        F.when(F.col("conv_us").isNotNull(), 1).otherwise(0).alias("observed"),
        (
            (F.coalesce("conv_us", "tlast_us") - F.col("t0_us"))
            / F.lit(3_600_000_000)
        )
        .cast("long")
        .alias("duration_h"),
    )
    buckets = per_user.groupBy("duration_h").agg(
        F.sum("observed").cast("long").alias("n_events"),
        F.sum(1 - F.col("observed")).cast("long").alias("n_censored"),
    )
    # life table ≤ horizon-hours rows: the single-partition window is a
    # metadata-sized frame by construction (documented contract above)
    w = (
        Window.orderBy(F.col("duration_h").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    at_risk = F.sum(F.col("n_events") + F.col("n_censored")).over(w)
    return buckets.select(
        "duration_h",
        "n_events",
        "n_censored",
        at_risk.cast("long").alias("n_at_risk"),
        (
            F.round(F.col("n_events") * 1000000.0 / at_risk).cast("long")
            / 1e6
        ).alias("hazard"),
    )


@query(
    "events_ks_test",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE},
    s AS (
      SELECT event_type,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    g AS (
      SELECT cents,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS a,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS b
      FROM s GROUP BY cents
    ),
    tot AS (SELECT CAST(SUM(a) AS BIGINT) AS n1,
                   CAST(SUM(b) AS BIGINT) AS n2 FROM g),
    cum AS (
      SELECT cents,
             SUM(a) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
             SUM(b) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
      FROM g
    ),
    d AS (
      -- HUGEINT cross-multiply: ca*n2 in BIGINT would overflow once
      -- n1*n2 > 2^63 (a few billion rows per class — reachable at the
      -- docstring's scale; ADVICE r11); Spark mirrors with decimal(38,0)
      SELECT cents,
             ABS(CAST(ca AS HUGEINT) * n2 - CAST(cb AS HUGEINT) * n1) AS d_num
      FROM cum, tot
      ORDER BY d_num DESC, cents ASC LIMIT 1
    )
    SELECT t.n1 AS n_click, t.n2 AS n_purchase,
           CAST(d.d_num AS BIGINT) AS d_num,
           d.cents AS ks_location_cents,
           CAST(ROUND(d.d_num * 1000000.0 / (t.n1 * t.n2)) AS BIGINT) / 1e6
             AS d_stat,
           (CAST(d.d_num AS HUGEINT) * d.d_num * 1000000
              > CAST(1844164 AS HUGEINT) * t.n1 * t.n2 * (t.n1 + t.n2))
             AS reject_5pct
    FROM d, tot t
    """,
)
def events_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov test between the click and
    purchase value distributions — the distribution-shift companion to
    dq_drift's binned PSI: KS is binning-free (the supremum over the
    exact empirical CDFs), so it catches shape changes PSI's 10-bin
    grid smears out.

    Exactness: D = max|F1−F2| is computed as max over the cents grid of
    the INTEGER |ca·n2 − cb·n1| (no float until the final 1e-6 snap of
    d_num/(n1·n2)); the 5% decision is the asymptotic two-sample bound
    D > 1.358·√((n1+n2)/(n1·n2)) squared into pure integer arithmetic
    (10^6·d² vs 1358²·n1·n2·(n1+n2)) — decimal on the Spark side,
    HUGEINT in DuckDB, exact in both.  Tie-break: the smallest cents
    value achieving the supremum.

    Headroom (ADVICE r11): the cross-multiplication is promoted to
    decimal(38,0) / HUGEINT in BOTH engines (int64 would overflow at
    n1·n2 > 2^63, a few billion rows per class), so d_num itself is
    exact to 10^38.  Two residual bounds are the OUTPUT contract, not
    the plan: the d_num column is BIGINT (valid while d_num < 2^63),
    and the squared 5% decision needs d_num²·10^6 inside decimal(38) /
    HUGEINT — valid while d_num ≲ 4·10^15, i.e. n1·n2·D ≲ 4·10^15.
    Beyond that, widen d_num's output type and spell the decision via
    the float bound (the 1e-6-snapped d_stat is already emitted).

    Plan: ONE fact scan — a hash-agg onto the bounded cents grid (≤49k
    distinct values by fixture contract — value ∈ [0, 490]×100); the
    running CDF and the totals are two frames of the SAME ordered
    window over that grid-sized METADATA (one Sort, one Window node, no
    self-join, no cross join); the argmax is a TakeOrdered(1).  At
    100 TB only the grid agg touches the fact table, shuffling ≤|grid|
    rows."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    g = s.groupBy("cents").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("b"),
    )
    w = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = g.select(
        "cents",
        F.sum("a").over(w).alias("ca"),
        F.sum("b").over(w).alias("cb"),
        F.sum("a").over(wall).alias("n1"),
        F.sum("b").over(wall).alias("n2"),
    )
    dec19 = "decimal(19,0)"
    d = (
        cum.select(
            "cents",
            # decimal(19,0)×decimal(19,0) → decimal(38,0): exact where
            # int64 ca·n2 would overflow (ADVICE r11; DuckDB side uses
            # HUGEINT for the same promotion)
            F.abs(
                F.col("ca").cast(dec19) * F.col("n2").cast(dec19)
                - F.col("cb").cast(dec19) * F.col("n1").cast(dec19)
            ).alias("d_num"),
            "n1",
            "n2",
        )
        .orderBy(F.col("d_num").desc(), F.col("cents").asc())
        .limit(1)
    )
    dnum_dec = F.col("d_num").cast("decimal(18,0)")
    return d.select(
        F.col("n1").alias("n_click"),
        F.col("n2").alias("n_purchase"),
        # BIGINT output contract: valid while d_num < 2^63 (docstring)
        F.col("d_num").cast("long").alias("d_num"),
        F.col("cents").alias("ks_location_cents"),
        (
            F.round(F.col("d_num") * 1000000.0 / (F.col("n1") * F.col("n2")))
            .cast("long")
            / 1e6
        ).alias("d_stat"),
        (
            dnum_dec * dnum_dec * F.lit(1000000).cast("decimal(7,0)")
            > F.lit(1844164).cast("decimal(18,0)")
            * F.col("n1").cast("decimal(18,0)")
            * F.col("n2")
            * (F.col("n1") + F.col("n2"))
        ).alias("reject_5pct"),
    )
