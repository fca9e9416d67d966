"""Set operators — bag and distinct semantics (SURVEY.md §2.7)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreaming_spark.io import EVENTS_ORACLE_CTE, load_table
from kafkastreaming_spark.registry import query


def _ev_slice(spark: SparkSession, sf_dir: str, etype: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == etype).select("user_id", "event_type", "value")


@query(
    "set_union_all",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE}
    SELECT user_id, event_type, value FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT user_id, event_type, value FROM events WHERE event_type = 'view'
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union — pure concatenation, no shuffle at all."""
    return _ev_slice(spark, sf_dir, "click").unionAll(_ev_slice(spark, sf_dir, "view"))


@query(
    "set_union",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE}
    SELECT user_id FROM events WHERE event_type = 'click'
    UNION
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct union — union + hash-distinct (one shuffle on the row)."""
    a = _ev_slice(spark, sf_dir, "click").select("user_id")
    b = _ev_slice(spark, sf_dir, "purchase").select("user_id")
    return a.union(b).distinct()


@query(
    "set_intersect",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE}
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct intersection (users who both clicked and errored)."""
    a = _ev_slice(spark, sf_dir, "click").select("user_id")
    b = _ev_slice(spark, sf_dir, "error").select("user_id")
    return a.intersect(b)


@query(
    "set_except",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE}
    SELECT DISTINCT user_id FROM events
    EXCEPT
    SELECT DISTINCT o_custkey AS user_id FROM orders WHERE o_totalprice > 300000
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct difference across two tables sharing an id space."""
    ev = load_table(spark, sf_dir, "events").select("user_id").distinct()
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("user_id"))
        .distinct()
    )
    return ev.subtract(o)


@query(
    "set_intersect_all",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE}
    SELECT user_id, event_type FROM events WHERE value < 250
    INTERSECT ALL
    SELECT user_id, event_type FROM events WHERE value >= 100
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag intersection — multiplicity = min(m, n) per row value."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("value") < 250).select("user_id", "event_type")
    b = ev.filter(F.col("value") >= 100).select("user_id", "event_type")
    return a.intersectAll(b)


@query(
    "set_except_all",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE}
    SELECT user_id, event_type FROM events WHERE value < 250
    EXCEPT ALL
    SELECT user_id, event_type FROM events WHERE value >= 100
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag difference — multiplicity = max(m - n, 0) per row value."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("value") < 250).select("user_id", "event_type")
    b = ev.filter(F.col("value") >= 100).select("user_id", "event_type")
    return a.exceptAll(b)
