"""Window function operators (SURVEY.md §2.5).

Determinism rules (SURVEY.md §5.4): every ordering carries a unique-key
tiebreak, and every windowed sum/avg goes through exact decimal arithmetic
(running double sums are accumulation-order-dependent and the two engines
would drift by ULPs otherwise).

Scale note: window functions shuffle once on the partition key and sort
within partitions.  At 100 TB the lever is ``repartitionByRange`` /
AQE-coalesce on the same key to keep partitions executor-sized; a window
with no PARTITION BY is a single-task funnel and never appears here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkastreaming_spark.io import EVENTS_ORACLE_CTE, load_table
from kafkastreaming_spark.registry import query

_DEC = "decimal(24,8)"


@query(
    "win_topk_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey
                  ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
)
def win_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — row_number + filter (the grouped-top-k
    idiom; Spark pushes the rn<=3 filter into the window sort as a
    per-partition limit via WindowGroupLimit)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "win_rank",
    oracle="""
    SELECT p_partkey, p_brand, p_retailprice,
           CAST(rank() OVER w AS INTEGER) AS rnk,
           CAST(dense_rank() OVER w AS INTEGER) AS drnk,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile,
           percent_rank() OVER w AS prank,
           cume_dist() OVER w AS cdist
    FROM part
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey)
    """,
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family within brand, total order via p_partkey tiebreak.
    percent_rank/cume_dist are exact small-integer ratios — identical IEEE
    division in both engines, no rounding needed."""
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return p.select(
        "p_partkey",
        "p_brand",
        "p_retailprice",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("prank"),
        F.cume_dist().over(w).alias("cdist"),
    )


@query(
    "win_lag_lead",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE}
    SELECT event_id, user_id, ts, value,
           value - lag(value) OVER w AS delta_value,
           lead(event_type) OVER w AS next_type,
           lag(event_type, 2, 'none') OVER w AS prev2_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user deltas and neighbor lookups over event time."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        (F.col("value") - F.lag("value").over(w)).alias("delta_value"),
        F.lead("event_type").over(w).alias("next_type"),
        F.lag("event_type", 2, "none").over(w).alias("prev2_type"),
    )


@query(
    "win_running",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(24,8))) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue per customer — exact-decimal running sum."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast(_DEC)).over(w).cast("double").alias("running_spend"),
    )


@query(
    "win_moving",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE}
    SELECT event_id, user_id, ts,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(24,8))) OVER w AS DOUBLE)
                 / COUNT(*) OVER w, 6) AS moving_avg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def win_moving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average per user (exact decimal sum / frame count)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    avg = F.sum(F.col("value").cast(_DEC)).over(w).cast("double") / F.count(F.lit(1)).over(w)
    return ev.select(
        "event_id", "user_id", "ts", F.round(avg, 6).alias("moving_avg")
    )


@query(
    "win_range_frame",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE},
    e AS (SELECT event_id, user_id, ts, value,
                 CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS epoch_s
          FROM events)
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(24,8))) OVER (
                PARTITION BY user_id ORDER BY epoch_s
                RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS sum_10min
    FROM e
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sum of value over the trailing 10 minutes per user — a RANGE frame
    on epoch seconds (value-based frame, includes ties; no unique-order
    requirement because sum is frame-complete)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "epoch_s", F.unix_timestamp(F.date_trunc("second", F.col("ts")))
    )
    w = Window.partitionBy("user_id").orderBy("epoch_s").rangeBetween(-600, 0)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast(_DEC)).over(w).cast("double").alias("sum_10min"),
    )


@query(
    "win_first_last",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice) OVER w AS last_price,
           nth_value(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth value over an explicit full-partition frame."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


@query(
    "win_percentiles",
    oracle="""
    WITH w AS (
      SELECT c_custkey, c_nationkey, c_acctbal,
             row_number() OVER pw AS rn,
             COUNT(*) OVER (PARTITION BY c_nationkey) AS n,
             ntile(4) OVER pw AS quartile
      FROM customer
      WINDOW pw AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    )
    SELECT c_custkey, c_nationkey, c_acctbal,
           CASE WHEN n = 1 THEN 0.0
                ELSE CAST(ROUND((rn - 1) * 1000000.0 / (n - 1)) AS BIGINT)
                     / 1e6 END AS pct_rank,
           CAST(ROUND(rn * 1000000.0 / n) AS BIGINT) / 1e6 AS cume_dist,
           quartile
    FROM w
    """,
)
def win_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-position window battery (added r8): percent_rank,
    cume_dist, and ntile(4) of customers by account balance within each
    nation — the quantile-bucketing triple behind scorecards and spend
    segmentation (events_rfm uses the same ntile machinery over events).

    The (c_acctbal, c_custkey) total order makes ordering unique, so
    percent_rank ≡ (row_number−1)/(n−1) and cume_dist ≡ row_number/n —
    spelled THAT way because ROUND(k/n, 6) is a cross-engine trap:
    with n = 2^a·5^b (sf0.1 nations have n=640) the ratio is an exact
    7-decimal half-tie that is NOT binary-representable, and Spark
    (decimal-string HALF_UP) and DuckDB (multiply-then-round) resolve
    it differently — caught by the r8 sf0.1 sweep, invisible at
    sf0.01 where n=60 never terminates.  The snap k·10⁶/n → ROUND →
    BIGINT → /1e6 keeps every tie on a binary-REPRESENTABLE .5, where
    both engines round away from zero identically.  n=1 partitions
    define pct_rank = 0 (the SQL-standard convention) instead of 0/0.

    One (nation) shuffle + one sort serves all three frames; at 100 TB
    this is a single window pass over the (bounded) entity table, not
    the fact table."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    wn = Window.partitionBy("c_nationkey")
    rn = F.row_number().over(w)
    n = F.count(F.lit(1)).over(wn)
    return cust.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.when(n == 1, F.lit(0.0))
        .otherwise(
            F.round((rn - 1) * 1000000.0 / (n - 1)).cast("long") / 1e6
        )
        .alias("pct_rank"),
        (F.round(rn * 1000000.0 / n).cast("long") / 1e6).alias(
            "cume_dist"
        ),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "win_count_distinct",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE},
    flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts, event_id) = 1
                  THEN 1 ELSE 0 END AS first_seen
      FROM events
    )
    SELECT user_id, ts, event_id,
           CAST(SUM(first_seen) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS n_types_so_far
    FROM flagged
    """,
)
def win_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over a window — the feature-engineering
    staple ("how many distinct event types has this user produced so
    far?") that Spark's window frames do not support natively.

    Portable two-phase spelling (identical in both engines, exact
    ints): flag each row that is the FIRST occurrence of its
    (user, type) via row_number()=1, then running-sum the flags per
    user.  This replaces the non-portable distinct-frame (and the
    collect_set memory hog: a distinct-in-frame set grows with
    cardinality; the flag spelling carries one bit per row).  The flag
    window partitions by (user_id, event_type) and the running sum by
    user_id — two exchanges, but the second re-hashes rows that are
    ALREADY user-clustered, so at scale AQE-coalesced partitions make
    it a cheap local-heavy shuffle; Spark cannot express the
    first-occurrence window under user_id-only partitioning, so two
    exchanges is the floor for the portable spelling."""
    ev = load_table(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ev.withColumn(
            "first_seen",
            F.when(F.row_number().over(w_first) == 1, 1).otherwise(0),
        )
        .select(
            "user_id",
            "ts",
            "event_id",
            F.sum("first_seen").over(w_run).cast("long").alias(
                "n_types_so_far"
            ),
        )
    )


@query(
    "win_streak",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE},
    days AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS d
      FROM events
    ),
    numbered AS (
      SELECT user_id, d,
             row_number() OVER (PARTITION BY user_id ORDER BY d) AS rn
      FROM days
    ),
    islands AS (
      SELECT user_id, d - rn * INTERVAL 1 DAY AS grp, d FROM numbered
    ),
    streaks AS (
      SELECT user_id, grp,
             CAST(COUNT(*) AS BIGINT) AS len,
             MIN(d) AS streak_start, MAX(d) AS streak_end
      FROM islands GROUP BY user_id, grp
    ),
    best AS (
      SELECT user_id, len, streak_start, streak_end,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY len DESC, streak_start) AS pick,
             CAST(SUM(len) OVER (PARTITION BY user_id) AS BIGINT)
               AS n_active_days,
             CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT)
               AS n_streaks
      FROM streaks
    )
    SELECT user_id, n_active_days, n_streaks,
           len AS best_len, streak_start AS best_start,
           streak_end AS best_end
    FROM best WHERE pick = 1
    """,
)
def win_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity STREAK per user — the
    gaps-and-islands window idiom (the date-granularity sibling of
    events_sessionize's timestamp-gap islands): consecutive active
    days share the invariant `day − row_number`, so one window plus
    one group-by labels every streak without any self-join or
    iterative expansion.

    Output per user: total active days, number of streaks, and the
    best streak's length/start/end (ties broken earliest-start — a
    total order, so the hash pins tie semantics).  All arithmetic is
    integer date math; no floats anywhere.

    Plan: distinct (user, day) first — the ONLY pass over raw events,
    combine-heavy because a user's events cluster in time — then two
    user-keyed windows over the shrunk day table (Spark plans both
    over ONE exchange+sort since partition keys match).  At 100 TB the
    day table is ≤ users × span-days regardless of event volume; the
    window partitions are per-user (bounded by the date span), so no
    single-task funnel exists — the windows.py scale rule."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).distinct()
    islands = days.select(
        "user_id",
        "d",
        F.expr("timestampadd(DAY, -row_number() OVER "
               "(PARTITION BY user_id ORDER BY d), d)").alias("grp"),
    )
    streaks = islands.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("len"),
        F.min("d").alias("streak_start"),
        F.max("d").alias("streak_end"),
    )
    wu = Window.partitionBy("user_id")
    wp = wu.orderBy(F.col("len").desc(), "streak_start")
    best = streaks.select(
        "user_id",
        "len",
        "streak_start",
        "streak_end",
        F.row_number().over(wp).alias("pick"),
        F.sum("len").over(wu).cast("long").alias("n_active_days"),
        F.count(F.lit(1)).over(wu).cast("long").alias("n_streaks"),
    )
    return best.filter(F.col("pick") == 1).select(
        "user_id",
        "n_active_days",
        "n_streaks",
        F.col("len").alias("best_len"),
        F.col("streak_start").alias("best_start"),
        F.col("streak_end").alias("best_end"),
    )


@query(
    "win_ntile",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE},
    v AS (
      SELECT event_id, event_type,
             CAST(ROUND(value * 100) AS BIGINT) AS value_cents
      FROM events
    ),
    r AS (
      SELECT event_id, event_type, value_cents,
             NTILE(4) OVER (PARTITION BY event_type
                            ORDER BY value_cents, event_id) AS quartile,
             RANK() OVER (PARTITION BY event_type
                          ORDER BY value_cents) AS rk,
             COUNT(*) OVER (PARTITION BY event_type
                            ORDER BY value_cents) AS cnt_le,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM v
    )
    SELECT event_id, event_type, value_cents,
           CAST(quartile AS BIGINT) AS quartile,
           CASE WHEN n = 1 THEN 0.0
                ELSE CAST(ROUND((rk - 1) * 1000000.0 / (n - 1)) AS BIGINT)
                     / 1e6 END
             AS pct_rank,
           CAST(ROUND(cnt_le * 1000000.0 / n) AS BIGINT) / 1e6
             AS cume_dist
    FROM r
    """,
)
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-position windows per event_type: NTILE(4) quartile
    assignment (total order: value then event_id, so the bucket split is
    deterministic), percent_rank, and cume_dist — the standard scoring
    trio for percentile features and outlier capping.

    percent_rank/cume_dist are NOT taken from the engines' built-ins:
    both are integer ratios ((rank-1)/(n-1), |rows ≤ current|/n) whose
    double spellings can disagree at exact 7-decimal half-ties (the r8
    ratio-snap sweep), so both are computed from exact int64 rank/count
    windows and snapped through the tie-safe 10⁶ grid.  cnt_le uses the
    SQL-standard default frame (RANGE UNBOUNDED PRECEDING..CURRENT ROW),
    which counts tied peers — exactly cume_dist's numerator.

    Plan: ONE shuffle on event_type serves all four windows (same
    partition key; Spark plans a single Exchange with chained sorts).
    At 100 TB a 5-type partition key would funnel — the production
    spelling salts the partition into (event_type, range-bucket) and
    merges bucket offsets, the win_percentiles pattern."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    wt = Window.partitionBy("event_type")
    w_order = wt.orderBy("value_cents", "event_id")
    w_rank = wt.orderBy("value_cents")
    r = v.select(
        "event_id",
        "event_type",
        "value_cents",
        F.ntile(4).over(w_order).cast("long").alias("quartile"),
        F.rank().over(w_rank).alias("rk"),
        # default frame over an ORDER BY window = RANGE ..CURRENT ROW:
        # counts all tied peers, the cume_dist numerator
        F.count(F.lit(1)).over(w_rank).alias("cnt_le"),
        F.count(F.lit(1)).over(wt).alias("n"),
    )
    return r.select(
        "event_id",
        "event_type",
        "value_cents",
        "quartile",
        # n=1 guard (the win_percentiles discipline): a single-row
        # partition makes (rk-1)/(n-1) = 0/0 — Spark yields NULL,
        # DuckDB yields NaN with undefined ROUND/CAST; both sides pin 0.
        F.when(F.col("n") == 1, F.lit(0.0))
        .otherwise(
            F.round((F.col("rk") - 1) * 1000000.0 / (F.col("n") - 1))
            .cast("long") / 1e6
        )
        .alias("pct_rank"),
        (
            F.round(F.col("cnt_le") * 1000000.0 / F.col("n"))
            .cast("long") / 1e6
        ).alias("cume_dist"),
    )


@query(
    "win_session_tvf",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE},
    ord AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT *,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sidx
      FROM ord
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM sess GROUP BY user_id, sidx
    """,
)
def win_session_tvf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BUILT-IN session windows in batch: ``groupBy(user,
    session_window(ts, '30 minutes'))`` — the engine-native twin of
    events_sessionize's hand-rolled lag→flag→running-sum spelling, and
    the same operator stream_session uses on the streaming side (batch
    and streaming share ONE sessionization code path; this key pins the
    batch half against an independent implementation).

    Boundary semantics the oracle must mirror exactly: session_window
    merges an event while it STARTS BEFORE the previous event's
    ts + gap, so a new session opens at ts >= prev + 30min (``>=``, vs
    events_sessionize's documented ``>`` convention), and the emitted
    window END is last_event + gap, not last_event.

    Plan: one shuffle on user_id; Spark plans session_window as an
    UpdatingSessionsExec + MergingSessionsExec pair over the same
    exchange a manual window would use — per-user state is one open
    session, the reason the streaming twin's state stays O(users)."""
    ev = load_table(spark, sf_dir, "events")
    sw = F.session_window("ts", "30 minutes")
    return (
        ev.groupBy("user_id", sw)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                "cents"
            ),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "cents",
        )
    )
