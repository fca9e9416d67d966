"""Date/time function bundle (SURVEY.md §2.8 fn_date).

Dialect reconciliation happens in the ORACLE, never in the Spark
semantics (SURVEY.md §5.4):

* Spark ``dayofweek`` is 1=Sunday; DuckDB ``dayofweek`` is 0=Sunday → +1.
* DuckDB year/month/day return BIGINT → cast to INTEGER (Spark's type).
* date_add returns DATE in Spark → cast both sides to TIMESTAMP so no
  DATE type ever reaches the client (date/timestamp pandas dtypes differ
  between the two client libraries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreaming_spark.io import load_table
from kafkastreaming_spark.registry import query


@query(
    "fn_date",
    oracle="""
    SELECT o_orderkey, o_orderdate,
           CAST(year(o_orderdate) AS INTEGER) AS o_year,
           CAST(month(o_orderdate) AS INTEGER) AS o_month,
           CAST(dayofmonth(o_orderdate) AS INTEGER) AS o_day,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS o_dow,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00')
                AS INTEGER) AS days_to_y2k,
           CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
           strftime(o_orderdate, '%Y-%m-%d') AS iso_day
    FROM orders
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day/dayofweek/date_trunc/datediff/date_add/last_day/
    unix_timestamp/date_format over orders."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        "o_orderdate",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.dayofweek("o_orderdate").alias("o_dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate")).alias(
            "days_to_y2k"
        ),
        F.date_add(F.col("o_orderdate"), 30).cast("timestamp").alias("due_date"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
    )


@query(
    "fn_interval",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS TIMESTAMP)
             AS next_month,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS TIMESTAMP)
             AS next_quarter,
           o_orderdate + INTERVAL 90 MINUTE AS plus_90m,
           o_orderdate - INTERVAL 36 HOUR AS minus_36h,
           CAST(quarter(o_orderdate) AS INTEGER) AS o_quarter,
           CAST(dayofyear(o_orderdate) AS INTEGER) AS o_doy,
           CAST(weekofyear(o_orderdate) AS INTEGER) AS o_week,
           CAST(make_date(CAST(year(o_orderdate) AS INTEGER), 7, 1)
                AS TIMESTAMP) AS mid_year,
           CAST((epoch_us(o_orderdate)
                 - epoch_us(TIMESTAMP '1995-01-01')) // 3600000000
                AS BIGINT) AS hours_since_95
    FROM orders
    """,
)
def fn_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-arithmetic surface: calendar-aware month adds
    (add_months clamps 01-31 + 1 month to 02-29 — BOTH engines
    implement the end-of-month clamp, which is what the hash pins),
    sub-day INTERVAL add/subtract, quarter/dayofyear/ISO-week extracts,
    make_date construction, and an hours-since-epoch counter.

    Dialect notes (reconciled in the ORACLE, per the fn_date
    discipline): Spark add_months returns DATE → both sides route
    through DATE then re-cast TIMESTAMP; weekofyear is ISO-8601 in
    both engines (Jan 1 can be week 52/53 of the prior ISO year);
    hours_since is spelled as exact integer epoch-microsecond division
    rather than timestampdiff, whose boundary-vs-complete-interval
    counting differs between engines.

    Map-only expressions — calendar math is JVM-side codegen, scan
    speed at any scale."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.add_months(d, 1).cast("timestamp").alias("next_month"),
        F.add_months(d, 3).cast("timestamp").alias("next_quarter"),
        F.expr("o_orderdate + INTERVAL 90 MINUTES").alias("plus_90m"),
        F.expr("o_orderdate - INTERVAL 36 HOURS").alias("minus_36h"),
        F.quarter("o_orderdate").alias("o_quarter"),
        F.dayofyear("o_orderdate").alias("o_doy"),
        F.weekofyear("o_orderdate").alias("o_week"),
        F.make_date(F.year("o_orderdate"), F.lit(7), F.lit(1))
        .cast("timestamp")
        .alias("mid_year"),
        (
            (
                F.unix_timestamp("o_orderdate")
                - F.unix_timestamp(F.lit("1995-01-01").cast("timestamp"))
            )
            .cast("bigint")
            / 3600
        )
        .cast("bigint")
        .alias("hours_since_95"),
    )
