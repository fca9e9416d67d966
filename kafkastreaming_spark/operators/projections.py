"""Projection and predicate operators (SURVEY.md §2.2).

Per-row arithmetic needs no rounding for cross-engine determinism: the
same IEEE-754 double operations on the same inputs are bitwise identical
in Spark and DuckDB (unlike parallel *sums*, which are order-dependent —
see functions/numeric.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreaming_spark.io import load_table
from kafkastreaming_spark.registry import query


@query(
    "proj_compute",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           l_quantity * l_extendedprice AS gross,
           CAST(l_quantity AS BIGINT) AS qty_int
    FROM lineitem
    """,
)
def proj_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed columns with aliases — stays entirely in WholeStageCodegen."""
    li = load_table(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net.alias("net_price"),
        (net * (1 + F.col("l_tax"))).alias("charge"),
        (F.col("l_quantity") * F.col("l_extendedprice")).alias("gross"),
        F.col("l_quantity").cast("long").alias("qty_int"),
    )


@query(
    "filter_pred",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE (o_orderstatus IN ('F', 'P')
           AND o_totalprice BETWEEN 50000 AND 300000
           AND o_orderpriority LIKE '1-%')
       OR (o_orderstatus = 'O'
           AND NOT (o_orderpriority LIKE '5-%')
           AND o_custkey % 10 = 3
           AND o_orderdate IS NOT NULL)
    """,
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicate: AND/OR/NOT, IN, BETWEEN, LIKE, IS NULL."""
    o = load_table(spark, sf_dir, "orders")
    branch1 = (
        F.col("o_orderstatus").isin("F", "P")
        & F.col("o_totalprice").between(50000, 300000)
        & F.col("o_orderpriority").like("1-%")
    )
    branch2 = (
        (F.col("o_orderstatus") == "O")
        & ~F.col("o_orderpriority").like("5-%")
        & (F.col("o_custkey") % 10 == 3)
        & F.col("o_orderdate").isNotNull()
    )
    return o.filter(branch1 | branch2).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
