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


@query(
    "sort_nulls",
    oracle="""
    WITH base AS (
      SELECT c_custkey,
             CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
      FROM customer
    )
    SELECT c_custkey, bal,
           CAST(row_number() OVER (ORDER BY bal ASC NULLS LAST,
                                   c_custkey) AS BIGINT) AS rn_last,
           CAST(row_number() OVER (ORDER BY bal DESC NULLS FIRST,
                                   c_custkey) AS BIGINT) AS rn_first
    FROM base
    """,
)
def sort_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-ordering discipline: the engines DISAGREE by default (Spark
    sorts NULLs first ascending, DuckDB last), so any cross-engine sort
    over a nullable key must spell NULLS FIRST/LAST explicitly — this
    key pins both directions by EMITTING the ranks (the driver's hash
    is order-insensitive, so a bare ORDER BY proves nothing; a
    row_number over the explicit ordering does).  Negative balances
    become NULL to manufacture the nullable key; (bal, custkey) is a
    total order so both ranks are deterministic.

    Plan: two single-partition window sorts over one scan — rank
    emission is the point here, not scale; the production spelling
    partitions first (win_rank) and this key exists to pin the
    null-position semantics those partitioned sorts inherit."""
    c = load_table(spark, sf_dir, "customer")
    base = c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, None)
        .otherwise(F.col("c_acctbal"))
        .alias("bal"),
    )
    from pyspark.sql import Window

    w_last = Window.orderBy(
        F.col("bal").asc_nulls_last(), F.col("c_custkey")
    )
    w_first = Window.orderBy(
        F.col("bal").desc_nulls_first(), F.col("c_custkey")
    )
    return base.select(
        "c_custkey",
        "bal",
        F.row_number().over(w_last).cast("long").alias("rn_last"),
        F.row_number().over(w_first).cast("long").alias("rn_first"),
    )


@query(
    "sort_paginate",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    ORDER BY c_acctbal DESC, c_custkey
    LIMIT 25 OFFSET 50
    """,
)
def sort_paginate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination: page 3 of the balance leaderboard (LIMIT 25
    OFFSET 50) over a (acctbal, custkey) total order — the API-backend
    query shape.  ``DataFrame.offset`` is the native Spark 3.4+
    spelling; with a deterministic tiebreak the page content is
    engine-portable and hash-checkable.

    Scale note: OFFSET is inherently a top-(offset+limit) problem —
    Spark plans this as a global sort-limit of 75 rows (TakeOrdered),
    never a full sort; deep pagination (offset ≫ limit) should switch
    to keyset pagination (WHERE key > last_seen ORDER BY LIMIT), which
    is `filter_pred` + `topk_global` composition — documented here so
    nobody ships OFFSET 10_000_000 to a cluster."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select("c_custkey", "c_name", "c_acctbal")
        .orderBy(F.col("c_acctbal").desc(), "c_custkey")
        .offset(50)
        .limit(25)
    )
