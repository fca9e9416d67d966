"""Time-series depth: hierarchical rollups and deterministic sampling
(extends SURVEY.md §2.9/§2.1; declared in §2.14).

``stream_rollup`` is the continuous-aggregate (hypertable) pattern: the
coarse resolution is computed FROM the fine resolution, not from raw
rows — at 100 TB the 5-minute layer is a materialized streaming sink and
hourly/daily layers re-aggregate it at 1/300th the input volume.
Decimal sums make the two-level aggregation exactly associative, so the
rollup equals a direct hourly aggregation bit-for-bit (the oracle
computes it directly — that equality IS the correctness claim).

``scan_sample`` pins the sampling pattern every pipeline needs: a
deterministic hash-mod sample (portable 60-bit hash, SURVEY.md §2.12) is
reproducible across engines, runs, and cluster sizes — unlike
``df.sample()``, whose output depends on partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreaming_spark.functions.numeric import dsum, oracle_dsum
from kafkastreaming_spark.io import EVENTS_ORACLE_CTE, load_table
from kafkastreaming_spark.registry import query


@query(
    "stream_rollup",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE}
    SELECT make_timestamp(CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) * 1000000)
             AS hour_start,
           event_type,
           COUNT(*) AS n_events,
           {oracle_dsum('value', 'sum_value')}
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup: hourly aggregates derived from the 5-minute
    layer (12 input rows per output row), not from raw events.

    COUNT sums exactly; the money sum re-enters the exact-decimal path
    before the final round, so fine→coarse equals direct aggregation —
    which is what the oracle checks by computing hourly directly."""
    ev = load_table(spark, sf_dir, "events")
    five_min = ev.groupBy(
        F.window("ts", "5 minutes").alias("w"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n5"),
        F.sum(F.col("value").cast("decimal(24,8)")).alias("s5"),
    )
    return (
        five_min.groupBy(
            F.window(F.col("w.start"), "1 hour").alias("h"), "event_type"
        )
        .agg(
            F.sum("n5").alias("n_events"),
            F.round(F.sum("s5"), 2).cast("double").alias("sum_value"),
        )
        .select(
            F.col("h.start").alias("hour_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


_SAMPLE_HASH_SPARK = (
    "pmod(CAST(conv(substr(md5(CAST(event_id AS STRING)), 1, 15), 16, 10) AS BIGINT), 100)"
)
_SAMPLE_HASH_DUCK = (
    "CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15) AS BIGINT) % 100"
)


@query(
    "scan_sample",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE}
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE {_SAMPLE_HASH_DUCK} < 10
    """,
)
def scan_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample by key hash: reproducible across runs,
    engines, and partitionings (``df.sample`` is not), and consistent —
    the same event_id is always in or out, so samples of joined tables
    stay joinable.  The hash value is positive (<2^60), so Spark ``pmod``
    and DuckDB ``%`` agree."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.expr(_SAMPLE_HASH_SPARK) < 10).select(
        "event_id", "user_id", "event_type", "value"
    )
