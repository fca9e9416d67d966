"""Relational extensions: pivot/unpivot reshaping and correlated
subqueries (extends SURVEY.md §2; declared in §2.13).

Subqueries are spelled as SQL over temp views on purpose: they exercise
Catalyst's decorrelation rules (`RewriteCorrelatedScalarSubquery`,
exists-to-semi-join) — `.explain` shows the correlated form rewritten to
the same join shapes §2.3 uses, which is exactly why no custom operator
is needed at 100 TB: a correlated predicate IS a join after analysis.

Determinism: the correlated scalar uses MAX (exact for doubles — no
summation-order dependence); pivot cells use the exact-decimal money sum
from functions/numeric.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreaming_spark.functions.numeric import dsum, oracle_dsum
from kafkastreaming_spark.io import load_table, spread
from kafkastreaming_spark.registry import query

_PIVOT_YEARS = [1995, 1996, 1997, 1998]


@query(
    "agg_pivot",
    oracle=f"""
    SELECT o_orderpriority,
           {", ".join(oracle_dsum(f"CASE WHEN year(o_orderdate) = {y} THEN o_totalprice END", f'y{y}') for y in _PIVOT_YEARS)}
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order revenue per priority × year, years as columns.

    Spark's ``pivot`` with an EXPLICIT value list — never inferred, so
    the schema is stable (inference would add a distinct-scan job and
    make columns data-dependent).  Physically this is one hash-agg over
    conditional sums; the oracle spells that desugaring directly."""
    orders = load_table(spark, sf_dir, "orders")
    out = (
        orders.withColumn("yr", F.year("o_orderdate"))
        .groupBy("o_orderpriority")
        .pivot("yr", _PIVOT_YEARS)
        .agg(dsum("o_totalprice", "v"))
    )
    # pivot names columns by value ("1995"); alias to match the oracle
    return out.select(
        "o_orderpriority",
        *[F.col(f"`{y}`").alias(f"y{y}") for y in _PIVOT_YEARS],
    )


@query(
    "agg_unpivot",
    oracle=f"""
    WITH wide AS (
      SELECT l_returnflag,
             {oracle_dsum('l_quantity', 'sum_qty')},
             {oracle_dsum('l_extendedprice', 'sum_price')},
             {oracle_dsum('l_discount', 'sum_disc')}
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty'  AS metric, sum_qty  AS value FROM wide
    UNION ALL
    SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM wide
    UNION ALL
    SELECT l_returnflag, 'sum_disc' AS metric, sum_disc AS value FROM wide
    """,
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide per-flag aggregates → long (metric, value)
    rows — the wide→long reshape feeding metric stores and plotting.
    ``DataFrame.unpivot`` is a zero-shuffle Expand over the wide input;
    the oracle uses the equivalent UNION ALL spelling."""
    li = spread(
        load_table(spark, sf_dir, "lineitem").select(
            "l_returnflag", "l_quantity", "l_extendedprice", "l_discount"
        ),
        key="l_extendedprice",
    )
    wide = li.groupBy("l_returnflag").agg(
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_price"),
        dsum("l_discount", "sum_disc"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "sum_disc"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@query(
    "sub_scalar_corr",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal
    FROM customer c
    WHERE c_acctbal = (SELECT MAX(c2.c_acctbal) FROM customer c2
                       WHERE c2.c_nationkey = c.c_nationkey)
    """,
)
def sub_scalar_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: customers holding their nation's
    maximum balance.  Catalyst decorrelates this into an aggregate +
    join (no per-row re-execution — the naive reading would be O(n²));
    MAX keeps the comparison float-exact in both engines."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("ks_customer")
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_nationkey, c_acctbal
        FROM ks_customer c
        WHERE c_acctbal = (SELECT MAX(c2.c_acctbal) FROM ks_customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        """
    )


@query(
    "sub_exists",
    oracle="""
    SELECT o_orderkey, o_orderpriority
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_returnflag = 'R')
      AND o.o_orderkey NOT IN (SELECT l2.l_orderkey FROM lineitem l2
                               WHERE l2.l_discount > 0.09)
    """,
)
def sub_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS + NOT IN predicate subqueries: orders with a returned
    lineitem but no deep-discount lineitem.  Catalyst rewrites these to
    the left-semi / null-aware anti joins of §2.3 — same physical plans,
    declarative spelling.  (l_orderkey is non-null here, so NOT IN's
    three-valued-logic trap is inert and both engines agree.)"""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ks_orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("ks_lineitem")
    return spark.sql(
        """
        SELECT o_orderkey, o_orderpriority
        FROM ks_orders o
        WHERE EXISTS (SELECT 1 FROM ks_lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_returnflag = 'R')
          AND o.o_orderkey NOT IN (SELECT l2.l_orderkey FROM ks_lineitem l2
                                   WHERE l2.l_discount > 0.09)
        """
    )


@query(
    "sub_lateral_topn",
    oracle="""
    SELECT c_custkey, c_mktsegment, o_orderkey, o_totalprice, o_orderdate
    FROM customer,
    LATERAL (SELECT o_orderkey, o_totalprice, o_orderdate
             FROM orders WHERE o_custkey = c_custkey
             ORDER BY o_orderdate DESC, o_orderkey LIMIT 2) recent
    """,
)
def sub_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL top-N: each customer's two most recent orders —
    the per-entity-limit idiom ("latest N per key") spelled as the SQL
    standard's lateral subquery rather than a window function.

    Catalyst DE-CORRELATES this (`DecorrelateInnerQuery`): the per-row
    subquery becomes one WindowGroupLimit over orders partitioned by
    o_custkey, then a plain equi-join with customer — i.e. the engine
    rewrites the O(customers × orders) nested loop a naive executor
    would run into the same two-shuffle plan `win_topk_group` uses
    (plan-asserted in tests/test_plans.py).  At 100 TB that rewrite is
    the difference between infeasible and routine; the query text stays
    declarative either way."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("ks_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ks_orders")
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment, o_orderkey, o_totalprice, o_orderdate
        FROM ks_customer,
        LATERAL (SELECT o_orderkey, o_totalprice, o_orderdate
                 FROM ks_orders WHERE o_custkey = c_custkey
                 ORDER BY o_orderdate DESC, o_orderkey LIMIT 2) recent
        """
    )


@query(
    "sub_not_in",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_custkey NOT IN (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    """,
)
def sub_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``NOT IN (subquery)`` — the null-aware anti join (added r8).

    NOT IN is NOT a plain anti join: if the subquery produces any NULL,
    three-valued logic makes every row's predicate UNKNOWN and the
    result empty — so Catalyst must plan a NULL-AWARE anti join
    (``NullAwareAntiJoin`` / a LeftAnti with the null-check condition)
    whenever the key is nullable, which degrades to a broadcast +
    per-row null test rather than a hash lookup.  This key pins the
    declarative spelling and its semantics; c_custkey is non-null in
    the fixture, so the result equals the plain anti join and stays
    hash-checkable while the PLAN is the null-aware shape.  At 100 TB
    the practical advice stands in the docstring: prefer NOT EXISTS
    (join_anti) when the key is provably non-null — this key is the
    semantically-faithful fallback when it isn't."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ks_ni_orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("ks_ni_customer")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM ks_ni_orders
        WHERE o_custkey NOT IN (
          SELECT c_custkey FROM ks_ni_customer WHERE c_mktsegment = 'BUILDING'
        )
        """
    )


@query(
    "sub_any_all",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           c_acctbal > ALL (SELECT s_acctbal FROM supplier s
                            WHERE s.s_nationkey = c.c_nationkey)
             AS beats_all,
           c_acctbal < ANY (SELECT s_acctbal FROM supplier s
                            WHERE s.s_nationkey = c.c_nationkey)
             AS cheaper_than_some
    FROM customer c
    """,
)
def sub_any_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified comparison subqueries — ``> ALL`` / ``< ANY`` against
    a correlated set (each customer vs the supplier balances of their
    own nation).

    Spark SQL has no ALL/ANY quantifier syntax, so the Spark side IS
    the rewrite every optimizer (including DuckDB, whose native syntax
    the oracle keeps) performs under the hood: ``x > ALL (S)`` ≡
    ``x > max(S)`` (vacuously TRUE on empty S), ``x < ANY (S)`` ≡
    ``x < max(S)`` (FALSE on empty S) — one per-nation aggregate of the
    supplier side, then a single broadcast join on the correlation key.
    The aggregate collapses the subquery side to |nations| rows BEFORE
    the join, so the fact side never shuffles: this is exactly why
    quantified predicates cost one small agg + map-side join at 100 TB,
    not a per-row subquery.  Caveat pinned in the docstring on purpose:
    the max/min rewrite is only valid because s_acctbal is non-null —
    with NULLs, ALL/ANY go three-valued and need the null-aware form
    (see sub_not_in)."""
    cust = load_table(spark, sf_dir, "customer")
    sup = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("c_nationkey"))
        .agg(F.max("s_acctbal").alias("max_bal"))
    )
    return cust.join(F.broadcast(sup), "c_nationkey", "left").select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        (
            F.col("max_bal").isNull() | (F.col("c_acctbal") > F.col("max_bal"))
        ).alias("beats_all"),
        (
            F.col("max_bal").isNotNull()
            & (F.col("c_acctbal") < F.col("max_bal"))
        ).alias("cheaper_than_some"),
    )
