"""Query + oracle registry.

Every operator key from SURVEY.md §2 registers exactly one Spark query
callable ``(spark, sf_dir) -> DataFrame`` and, when SQL-expressible, one
DuckDB oracle SQL string.  ``__spark_entry__.py`` exposes these dicts to
the driver; tests and the local verifier iterate over them.

Usage::

    @query("agg_group", oracle="SELECT ...")
    def agg_group(spark, sf_dir):
        ...

Keys with no oracle (approximate / streaming-semantics-only operators,
SURVEY.md §2 "rows"-oracle rows) pass ``oracle=None`` and get a rows-only
check from the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(key: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate query key: {key}")
        QUERIES[key] = fn
        if oracle is not None:
            ORACLES[key] = oracle
        return fn

    return deco
