"""Streaming operators with batch-equivalent semantics (SURVEY.md §2.9).

These run the SAME expressions a Structured Streaming job uses
(``window``, ``session_window``, ``dropDuplicates``, stream-static join)
over the bounded events table, so the driver can hash-check them against
DuckDB; the genuinely-streaming behaviors (watermarks, late data,
incremental state) are exercised by the replay harness in
``streaming/harness.py`` and surface as rows-only keys in runtime.py.

Oracle note: DuckDB ``to_timestamp()`` returns TIMESTAMPTZ, so window
bucket timestamps are rebuilt with ``make_timestamp(µs)`` (tz-naive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreaming_spark.functions.numeric import dsum, oracle_dsum
from kafkastreaming_spark.io import EVENTS_ORACLE_CTE, load_table
from kafkastreaming_spark.registry import query

# µs-epoch bucketing helpers for the oracle side
_BUCKET = "make_timestamp(CAST(floor(epoch(ts) / {w}) * {w} AS BIGINT) * 1000000)"


@query(
    "stream_tumbling",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE}
    SELECT {_BUCKET.format(w=300)} AS window_start,
           {_BUCKET.format(w=300)} + INTERVAL 5 MINUTE AS window_end,
           event_type,
           COUNT(*) AS n_events,
           {oracle_dsum('value', 'sum_value')}
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling window count/sum per event_type.

    Identical logical plan to the streaming version (readStream + same
    groupBy) — in streaming, state per (window, event_type) is evicted
    once the watermark passes window_end.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "stream_sliding",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE},
    buckets AS (
      SELECT {_BUCKET.format(w=300)} AS window_start, event_type, value FROM events
      UNION ALL
      SELECT {_BUCKET.format(w=300)} - INTERVAL 5 MINUTE AS window_start,
             event_type, value FROM events
    )
    SELECT window_start,
           window_start + INTERVAL 10 MINUTE AS window_end,
           event_type,
           COUNT(*) AS n_events,
           {oracle_dsum('value', 'sum_value')}
    FROM buckets
    GROUP BY 1, 2, 3
    """,
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute window sliding every 5 — each event lands in 2 windows.

    The oracle unions the two bucket assignments explicitly
    (SURVEY.md §7.3 item 5)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "stream_session",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE},
    marked AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       <= INTERVAL 30 MINUTE
                  THEN 0 ELSE 1 END AS is_new
      FROM events
    ),
    islands AS (
      -- event_id in the ORDER BY keeps the cumulative sum aligned with
      -- the lag ordering above when two events share (user_id, ts)
      SELECT user_id, ts, value,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events,
           {oracle_dsum('value', 'sum_value')}
    FROM islands
    GROUP BY user_id, session_id
    """,
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap session windows per user.

    Spark's ``session_window`` merges overlapping per-event intervals
    [ts, ts+gap); the batch oracle is the classic gaps-and-islands
    rewrite.  Session end = last event + gap (Spark semantics)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "stream_dedup",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE}
    SELECT event_id, user_id, ts, event_type, value FROM events
    """,
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once dedup by event_id (batch twin of
    ``dropDuplicatesWithinWatermark`` — harness exercises the streaming
    variant with true duplicates and late arrivals).  event_id is the
    primary key, so output = input, deterministically."""
    ev = load_table(spark, sf_dir, "events")
    return ev.dropDuplicates(["event_id"]).select(
        "event_id", "user_id", "ts", "event_type", "value"
    )


@query(
    "stream_static_join",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE}
    SELECT c_mktsegment, event_type,
           COUNT(*) AS n_events,
           {oracle_dsum('value', 'sum_value')}
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment, event_type
    """,
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream enrichment against a static dimension (broadcast) +
    windowless rollup.  In streaming this is the only join that needs no
    watermark: the static side is broadcast to every micro-batch."""
    ev = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    return (
        ev.join(F.broadcast(c), ev.user_id == c.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
    )


@query(
    "stream_upsert_compact",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE},
    ranked AS (
      SELECT user_id, event_id, ts, event_type, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id, event_id, ts, event_type, value
    FROM ranked WHERE rn = 1
    """,
)
def stream_upsert_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC upsert compaction: collapse an append-only change stream to
    the LATEST row per key (ts desc, event_id desc as the total
    tie-break) — the batch twin of a changelog-to-table materialization
    (Kafka compacted topic / Delta MERGE / Paimon changelog).

    One shuffle on the key, then a per-partition sort emitting row 1 —
    Spark plans the rank-then-filter as WindowGroupLimit, so each
    partition keeps a single row per key instead of materializing the
    full rank.  In streaming the same semantics run as
    ``applyInPandasWithState`` keeping max-(ts, event_id) per key
    (stream_stateful); at rest, this query IS the compaction job."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type", "value")
    )


@query(
    "stream_topk",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE},
    winned AS (
      SELECT {_BUCKET.format(w=3600)} AS window_start,
             user_id, COUNT(*) AS n_events,
             {oracle_dsum('value', 'sum_value')}
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT *, CAST(row_number() OVER (PARTITION BY window_start
                     ORDER BY sum_value DESC, user_id) AS INTEGER) AS rnk
      FROM winned
    )
    SELECT window_start, user_id, n_events, sum_value, rnk
    FROM ranked WHERE rnk <= 3
    """,
)
def stream_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly top-3 purchasers by spend — the windowed-leaderboard query
    every event pipeline serves.

    Batch twin of the two-stage streaming topology: stage 1 is the
    same windowed aggregate a streaming job keeps as state (one row per
    (window, user)); stage 2 ranks WITHIN each closed window.  In
    production the rank runs in foreachBatch on windows the watermark
    has closed (complete-mode ranking over open state would re-emit
    every window on every trigger); the plan here is the identical
    agg → per-window WindowGroupLimit top-k, so the hash check pins the
    exact leaderboard a replayed stream must produce.  Scale shape: the
    heavy shuffle keys on (window, user) — high cardinality, uniform —
    and the rank's per-window partitions are already tiny post-agg."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    winned = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )
    rank_w = Window.partitionBy("window_start").orderBy(
        F.col("sum_value").desc(), "user_id"
    )
    return (
        winned.withColumn("rnk", F.row_number().over(rank_w))
        .filter(F.col("rnk") <= 3)
        .select("window_start", "user_id", "n_events", "sum_value", "rnk")
    )
