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
