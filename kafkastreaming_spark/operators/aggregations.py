"""Aggregation operators (SURVEY.md §2.4).

All two-phase (partial + final) HashAggregates — Spark's map-side combine
means the shuffle carries one row per (partition, group), so these scale
linearly with executor count at 100 TB.  Money sums use the exact-decimal
scheme in :mod:`kafkastreaming_spark.functions.numeric` for cross-engine
determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreaming_spark.functions.numeric import davg, dsum, oracle_davg, oracle_dsum
from kafkastreaming_spark.io import load_table
from kafkastreaming_spark.registry import query

# --------------------------------------------------------------------------
# agg_group — FLAGSHIP (TPC-H Q1 shape, SURVEY.md §7.4)
# --------------------------------------------------------------------------

_AGG_GROUP_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {oracle_dsum('l_quantity', 'sum_qty')},
  {oracle_dsum('l_extendedprice', 'sum_base_price')},
  {oracle_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
  {oracle_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
  {oracle_davg('l_quantity', 'avg_qty')},
  {oracle_davg('l_extendedprice', 'avg_price')},
  {oracle_davg('l_discount', 'avg_disc')},
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@query("agg_group", oracle=_AGG_GROUP_ORACLE)
def agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report: filter → group → 8 aggregates.

    Shuffle profile: partial HashAggregate collapses 600k rows to
    (#partitions × 4 groups) before the exchange — the shuffle is O(groups),
    not O(rows), so this plan is flat-out scan-bound at 100 TB.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
