"""Sort / limit / top-k operators (SURVEY.md §2.6)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreaming_spark.io import load_table
from kafkastreaming_spark.registry import query


@query(
    "sort_multi",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment, c_acctbal
    FROM customer
    ORDER BY c_mktsegment DESC, c_acctbal ASC NULLS LAST, c_custkey
    """,
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key global sort — range-partitioned exchange + per-partition
    sort.  (The driver hash is order-insensitive; the sort exercises the
    TakeOrderedAndProject/Sort physical operators and the content must
    still match.)"""
    c = load_table(spark, sf_dir, "customer")
    return c.orderBy(
        F.col("c_mktsegment").desc(),
        F.col("c_acctbal").asc_nulls_last(),
        F.col("c_custkey"),
    ).select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")


@query(
    "topk_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 with a deterministic total order (unique-key tiebreak).

    Plans as TakeOrderedAndProject: each partition keeps its local top-10,
    the driver merges — no global sort, no full shuffle, O(k) memory.
    This is the operator that stays cheap at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )
