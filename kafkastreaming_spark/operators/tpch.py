"""TPC-H classic composite queries (SURVEY.md §2: end-to-end relational
workloads a user of any analytics engine runs daily — multi-table join
trees that exercise Catalyst's join reordering, broadcast selection, and
partial aggregation all at once; adapted to this corpus's trimmed TPC-H
schema and 1995-2001 date range).

Plan expectations at scale: dimension joins (region, nation, customer at
ratio) broadcast; the lineitem fact side stays partitioned; aggregates
are two-phase; top-N is TakeOrderedAndProject, never a global sort.
Money sums follow the SURVEY §5.4 decimal discipline (order-independent
across partitionings)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreaming_spark.functions.numeric import (
    davg,
    dsum,
    oracle_davg,
    oracle_dsum,
)
from kafkastreaming_spark.io import load_table, spread
from kafkastreaming_spark.registry import query

_REV = "l_extendedprice * (1 - l_discount)"


@query(
    "tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {oracle_dsum('l_quantity', 'sum_qty')},
           {oracle_dsum('l_extendedprice', 'sum_base_price')},
           {oracle_dsum(_REV, 'sum_disc_price')},
           {oracle_dsum(_REV + ' * (1 + l_tax)', 'sum_charge')},
           {oracle_davg('l_quantity', 'avg_qty')},
           {oracle_davg('l_extendedprice', 'avg_price')},
           {oracle_davg('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 pricing summary: per (returnflag, linestatus), the full battery
    of quantity/price/discount/charge sums and averages at the shipdate
    cutoff.  Single-table, one shuffle on a 6-value grouping key — the
    canonical two-phase partial+final HashAggregate; the shipdate
    predicate reaches the parquet scan.  All money math goes through the
    §5.4 decimal discipline (3-way products are ≤6-decimal exact)."""
    # r16: project then `spread` (guide §2.5) — single-row-group fixture
    # files otherwise fuse scan + the decimal partial aggregate into one
    # task (same fix and measurement as agg_group; no-op on healthy layouts).
    li = spread(
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= "2001-09-02")
        .select(
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax",
        ),
        key="l_extendedprice",
    )
    disc_price = F.expr(_REV)
    charge = F.expr(f"{_REV} * (1 + l_tax)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
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
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "tpch_q10",
    oracle=f"""
    SELECT c_custkey, c_name, {oracle_dsum(_REV, 'revenue')},
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 returned-item reporting: top-20 customers by lost revenue on
    returned ('R') items in 1996Q4.  The returnflag and orderdate
    predicates push into the two fact scans; customer and nation
    broadcast; the limit resolves via TakeOrderedAndProject with
    c_custkey as the deterministic tie-break."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-10-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(F.expr(_REV), "revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "tpch_q3",
    oracle=f"""
    SELECT l_orderkey, o_orderdate, o_orderpriority,
           {oracle_dsum(_REV, 'revenue')}
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shipping priority: top-10 unshipped BUILDING-segment orders by
    revenue at the cutoff date.  customer is the small side (broadcast);
    the lineitem scan carries the pushed-down shipdate predicate; the
    limit resolves via TakeOrderedAndProject on the total order
    (revenue desc, o_orderdate, l_orderkey)."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-03-15"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-03-15"
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.expr(_REV), "revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "tpch_q5",
    oracle=f"""
    SELECT n_name, {oracle_dsum(_REV, 'revenue')}
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 local supplier volume: 1996 revenue per ASIA nation where the
    supplier and customer share the nation.  Six-table join tree —
    region/nation/supplier/customer broadcast down onto the lineitem ⋈
    orders fact join; the local-supplier constraint is the extra
    c_nationkey = s_nationkey equi-condition."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(
            F.broadcast(supp),
            (li["l_suppkey"] == supp["s_suppkey"])
            & (cust["c_nationkey"] == supp["s_nationkey"]),
        )
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("n_name")
        .agg(dsum(F.expr(_REV), "revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "tpch_q6",
    oracle=f"""
    SELECT {oracle_dsum('l_extendedprice * l_discount', 'revenue')},
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24.0
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 forecasting revenue change: potential revenue from dropping
    small-quantity 1996 discounts in the [0.05, 0.07] band.

    The pure scan-predicate aggregate: ALL THREE predicates (date range,
    discount band, quantity cap) push into the parquet reader as row-
    group min/max filters — at 100 TB this query's cost is file skipping,
    not compute.  One global aggregate, no shuffle beyond the single-row
    final combine.  (The discount band compares the same float64 parquet
    values in both engines, so BETWEEN is cross-engine exact.)"""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24.0)
    )
    return li.agg(
        dsum(F.expr("l_extendedprice * l_discount"), "revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "tpch_q14",
    oracle=f"""
    SELECT
      ROUND(100.0 * CAST(ROUND(SUM(CAST(CASE WHEN p_type = 'PROMO'
                     THEN {_REV} ELSE 0 END AS DECIMAL(24,8))), 2) AS DOUBLE)
            / CAST(ROUND(SUM(CAST({_REV} AS DECIMAL(24,8))), 2) AS DOUBLE),
            6) AS promo_revenue_pct,
      {oracle_dsum(_REV, 'total_revenue')}
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate <  TIMESTAMP '1996-10-01'
    """,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 promotion effect: share of September-1996 revenue from PROMO
    parts (adapted: this corpus's p_type is a single word, so the match
    is equality, not LIKE 'PROMO%').

    The part dimension broadcasts onto the date-pruned lineitem scan; the
    promo share is a conditional sum inside the SAME single aggregate —
    one pass, one broadcast join, no second scan.  Both sums go through
    the exact-decimal discipline, then the final ratio runs the identical
    IEEE division in both engines, rounded 6dp."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-09-01") & (F.col("l_shipdate") < "1996-10-01")
    )
    rev = F.expr(_REV)
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    joined = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    promo_sum = F.round(F.sum(promo_rev.cast("decimal(24,8)")), 2).cast("double")
    total_sum = F.round(F.sum(rev.cast("decimal(24,8)")), 2).cast("double")
    return joined.agg(
        F.round(F.lit(100.0) * promo_sum / total_sum, 6).alias("promo_revenue_pct"),
        dsum(rev, "total_revenue"),
    )


@query(
    "tpch_q18",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, SUM(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 300
    )
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(total_qty AS DOUBLE) AS total_qty
    FROM big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
    """,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 large-volume customers: orders whose total quantity exceeds
    300 units, with the buyer.  The HAVING pre-aggregation shrinks the
    fact side to a handful of orderkeys BEFORE any join — the aggregate-
    then-join ordering that matters at 100 TB (joining first would
    shuffle the whole lineitem table for rows that are then discarded).
    l_quantity sums are small exact integers in doubles — no decimal
    discipline needed."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("total_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderdate", "o_orderkey")
        .limit(100)
    )


@query(
    "tpch_q4",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 order-priority checking (adapted: this corpus has no
    commitdate/receiptdate, so "late" means a line shipped more than 60
    days after the order date).  Count 1996Q3 orders per priority that
    had at least one late line.

    The EXISTS spells as a LEFT SEMI join — each order contributes once
    no matter how many late lines it has, and the semi join never
    materializes lineitem columns.  The orderdate predicate prunes the
    orders scan before the join; the extra range condition rides the
    equi-join as a post-probe filter.  One 5-value hash-agg after."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > orders["o_orderdate"] + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "tpch_q16",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_type <> 'PROMO'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 parts/supplier relationship (adapted: no partsupp table — the
    lineitem fact is the part↔supplier evidence; the excluded-supplier
    predicate is negative account balance instead of the comment LIKE).

    Shape that matters at 100 TB: the NOT IN subquery is a tiny
    broadcast ANTI join (the exclusion list is ~6 rows here, never big),
    part broadcasts onto the fact scan with the type/size predicates
    evaluated dimension-side BEFORE the join, and the count-distinct
    runs as the standard two-shuffle expand on (brand, type, size,
    suppkey).  s_suppkey is non-null, so NOT IN ≡ anti join — the
    null-aware trap never triggers."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad_supp), li["l_suppkey"] == bad_supp["s_suppkey"], "left_anti")
        .join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "tpch_q19",
    oracle=f"""
    SELECT {oracle_dsum(_REV, 'revenue')}, COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 discounted revenue (adapted: no container/shipmode columns —
    the disjunction is over (brand, size band, quantity band) triples).

    The classic disjunctive-predicate join: each disjunct constrains
    BOTH sides, so Catalyst derives the single-side implications — the
    part scan keeps only the three brands, the lineitem scan keeps only
    quantity 1..30 — and pushes them into the parquet readers, while the
    full cross-side disjunction evaluates after the broadcast hash join
    probe.  One pass, one broadcast, a single global aggregate."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load_table(spark, sf_dir, "lineitem")
    joined = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 20)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.filter(cond).agg(
        dsum(F.expr(_REV), "revenue"), F.count(F.lit(1)).alias("n_lines")
    )


@query(
    "tpch_q12",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shipping-priority census (adapted: the trimmed schema has no
    l_shipmode/commitdate, so the mode axis becomes l_linestatus and the
    late-delivery predicate becomes the shipdate year window): per
    status, how many lines belong to high- vs low-priority orders.

    The interesting plan property: a FACT×FACT equi-join (orders ×
    lineitem on orderkey — neither side broadcastable at scale) feeding
    a two-phase conditional-count aggregate; the year predicate pushes
    to the lineitem scan, shrinking the join's build side before the
    shuffle.  At 100 TB both sides bucket on orderkey and the join is
    shuffle-free."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "tpch_q13",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 customer order-count distribution (adapted: the comment
    NOT-LIKE filter becomes an order-priority exclusion): how many
    customers placed 0, 1, 2, ... qualifying orders — zero-order
    customers included via the LEFT join.

    Two cascaded aggregations: per-customer count (shuffle on custkey —
    the join key, so AQE reuses the exchange), then the tiny histogram
    agg.  The filter rides the join condition, not a WHERE, which is
    exactly what preserves the zero-order customers."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "tpch_q17",
    oracle="""
    WITH target_parts AS (
      SELECT p_partkey FROM part
      WHERE p_brand = 'Brand#5' AND p_type = 'ECONOMY'
    ),
    li AS (
      SELECT l_partkey, l_quantity, l_extendedprice
      FROM lineitem JOIN target_parts ON l_partkey = p_partkey
    ),
    thresh AS (
      SELECT l_partkey,
             ROUND(CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(24,8))), 6)
                        AS DOUBLE) / COUNT(*), 6) AS avg_qty
      FROM li GROUP BY l_partkey
    )
    SELECT CAST(ROUND(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(24,8))), 2)
                      AS DOUBLE) / 7.0, 2) AS DOUBLE) AS avg_yearly
    FROM li JOIN thresh USING (l_partkey)
    WHERE l_quantity < 0.2 * avg_qty
    """,
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 small-quantity-order revenue (adapted: brand/type filter in
    place of the absent container column): yearly revenue lost if
    below-20%-of-average-quantity orders for the target parts stopped.

    The correlated scalar subquery (per-part avg quantity) decorrelates
    into one aggregate over the SAME pre-joined lineitem slice + a
    re-join on partkey — Catalyst's own decorrelation shape, spelled
    explicitly so both engines compute the identical davg discipline
    (exact decimal sum → double → round 6dp; the threshold comparison
    then runs on bit-identical doubles).  The part filter broadcasts;
    the per-part agg table is tiny; at scale the lineitem slice is the
    only fact-sized thing touched, twice, with the pushed-down partkey
    semi-join shrinking both passes."""
    part_f = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#5") & (F.col("p_type") == "ECONOMY")
    ).select("p_partkey")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .join(F.broadcast(part_f), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_quantity", "l_extendedprice")
    )
    thresh = li.groupBy("l_partkey").agg(davg("l_quantity", "avg_qty"))
    joined = li.join(F.broadcast(thresh), "l_partkey").filter(
        F.col("l_quantity") < 0.2 * F.col("avg_qty")
    )
    return joined.agg(
        F.round(
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(24,8)")), 2).cast(
                "double"
            )
            / 7.0,
            2,
        )
        .cast("double")
        .alias("avg_yearly")
    )


@query(
    "tpch_q22",
    oracle="""
    WITH avg_bal AS (
      SELECT ROUND(CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(24,8))), 6)
                   AS DOUBLE) / COUNT(*), 6) AS a
      FROM customer WHERE c_acctbal > 0.0
    ),
    rich_idle AS (
      SELECT c.c_nationkey, c.c_acctbal
      FROM customer c CROSS JOIN avg_bal
      WHERE c.c_acctbal > avg_bal.a
        AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    )
    SELECT c_nationkey,
           COUNT(*) AS numcust,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(24,8))), 2) AS DOUBLE)
             AS totacctbal
    FROM rich_idle
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 global sales opportunity (adapted: the phone-prefix country
    code becomes c_nationkey — the column the trimmed schema actually
    has): customers with above-average positive balances who never
    placed an order, grouped by nation.

    Three classic shapes in one query: a scalar aggregate broadcast as
    a cross join (the sub_scalar pattern, davg discipline so the
    threshold double is bit-identical), a LEFT ANTI join against orders
    (never a NOT IN — null-safe and shuffle-partitioned on the key),
    and a final two-phase agg.  At scale the anti join is the only
    shuffle on a fact table; the scalar side is one row."""
    cust = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        davg("c_acctbal", "a")
    )
    rich = cust.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("a")
    )
    idle = rich.join(
        orders, rich.c_custkey == orders.o_custkey, "left_anti"
    )
    return (
        idle.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "tpch_q7",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
           {oracle_dsum(_REV, 'revenue')}
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 volume shipping: discounted revenue flowing between a nation
    pair (both directions kept distinct) by ship year.

    Five-table join tree: the two nation joins broadcast trivially,
    supplier and customer broadcast at dimension ratio, and the
    orders×lineitem fact spine carries the single real shuffle; the
    nation-pair disjunction evaluates post-join (it spans both sides)
    while the shipdate range pushes to the lineitem scan.  Year
    extraction is exact integer math on the UTC timestamp."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = load_table(spark, sf_dir, "orders")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == n1.s_nk)
        .join(F.broadcast(n2), cust.c_nationkey == n2.c_nk)
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        joined.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(dsum(F.expr(_REV), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "tpch_q8",
    oracle=f"""
    WITH flows AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
             CAST({_REV} AS DECIMAL(24,8)) AS volume,
             n2.n_name AS supp_nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    )
    SELECT o_year,
           ROUND(CAST(ROUND(SUM(CASE WHEN supp_nation = 'NATION_1'
                                     THEN volume ELSE CAST(0 AS DECIMAL(24,8))
                                END), 6) AS DOUBLE)
                 / CAST(ROUND(SUM(volume), 6) AS DOUBLE), 6) AS mkt_share
    FROM flows
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 national market share: NATION_1's fraction of ECONOMY-part
    revenue sold into ASIA customers, by order year.

    Eight-table tree — the deepest join in the suite.  Region/nation/
    supplier/customer/part all broadcast (dimension ratio); the fact
    spine shuffles once on orderkey.  The share is a ratio of two
    exact-decimal sums (conditional numerator), each rounded 6dp before
    ONE double division — the agg_linreg/davg discipline, so the ratio
    is bit-identical cross-engine."""
    part_f = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    flows = (
        li.join(F.broadcast(part_f.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == n1.c_nk)
        .join(F.broadcast(region), n1.c_rk == region.r_regionkey)
        .join(F.broadcast(n2), supp.s_nationkey == n2.s_nk)
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            F.expr(_REV).cast("decimal(24,8)").alias("volume"),
            "supp_nation",
        )
    )
    num = F.round(
        F.sum(
            F.when(F.col("supp_nation") == "NATION_1", F.col("volume")).otherwise(
                F.lit(0).cast("decimal(24,8)")
            )
        ),
        6,
    ).cast("double")
    den = F.round(F.sum("volume"), 6).cast("double")
    return (
        flows.groupBy("o_year")
        .agg(F.round(num / den, 6).alias("mkt_share"))
        .orderBy("o_year")
    )


@query(
    "tpch_q15",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no, {oracle_dsum(_REV, 'total_revenue')}
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 top supplier: the supplier(s) whose quarterly revenue equals
    the maximum (ties kept, per the spec's view formulation).

    The revenue 'view' materializes as one pushed-down-scan aggregate;
    the scalar MAX is a 1-row aggregate of THAT table, broadcast back as
    a cross join (sub_scalar pattern) — the fact table is scanned once.
    Equality on revenue is safe because dsum's 2dp-rounded decimal →
    double conversion is exact and identical in both engines — the same
    reason the driver can hash it."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(F.expr(_REV), "total_revenue"))
        # the revenue view feeds BOTH the scalar MAX and the equality
        # join; without this pin each consumer re-runs the lineitem
        # scan + aggregate (r8 plan audit found exactly that drift)
        .localCheckpoint(eager=False)
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q21",
    oracle="""
    WITH l1 AS (
      SELECT l_orderkey, l_suppkey FROM lineitem
      JOIN orders ON o_orderkey = l_orderkey
      WHERE l_returnflag = 'R' AND o_orderstatus = 'F'
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_1'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 suppliers who kept orders waiting (adapted: the trimmed
    schema has no commit/receipt dates, so the 'late' marker becomes
    l_returnflag = 'R'): NATION_1 suppliers who were the SOLE at-fault
    supplier in a finalized multi-supplier order.

    The famous double-correlated-EXISTS query, spelled as Spark's
    native join types: LEFT SEMI for the EXISTS (another supplier
    participated) and LEFT ANTI for the NOT EXISTS (no OTHER supplier
    was at fault) — both equi-join on orderkey with the suppkey
    inequality as a residual condition, so each correlated subquery is
    one shuffle-partitioned pass over lineitem, never a per-row
    probe."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    waited = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("k2")) & (F.col("l_suppkey") != F.col("s2")),
        "left_semi",
    ).join(
        l3,
        (F.col("l_orderkey") == F.col("k3")) & (F.col("l_suppkey") != F.col("s3")),
        "left_anti",
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_1"
    )
    return (
        waited.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


# ---------------------------------------------------------------------------
# Derived partsupp (round 9): the driver's trimmed TPC-H fixture ships no
# partsupp.parquet, which blocked Q2/Q9/Q11/Q20 through eight rounds.  Both
# engines here derive the SAME partsupp deterministically from part ×
# supplier-count with TPC-H dbgen's supplier-assignment SHAPE (each part gets
# 4 suppliers at stride S/4; dbgen's RNG for cost/qty is not portable, so
# cost/qty use our own closed forms).  Because the Spark side and the DuckDB
# oracle compute partsupp from identical integer arithmetic, the four queries
# remain exact hash-checked end-to-end.  If the driver ever ships
# partsupp.parquet, swap _partsupp()/_PARTSUPP_CTE for the real scan and the
# query trees below are unchanged.
#
# ps_suppkey   = (p_partkey + i*(S DIV 4 + p_partkey DIV S)) % S,  i in 0..3
# ps_availqty  = (p_partkey*17 + ps_suppkey*19) % 9999 + 1
# ps_supplycost= ((p_partkey*7 + ps_suppkey*13) % 90000 + 10000) / 100.0
#
# Both engines' integer DIV/% truncate toward zero (DuckDB: -7//2 = -3,
# same as Spark DIV — ADVICE r9 correction), and truncate == floor here
# anyway because every term is nonnegative.  DISTINCT keeps (partkey,
# suppkey) a real PK (at tiny S the stride can wrap to 0 and collapse a
# part's four suppliers to one).

_PARTSUPP_CTE = """
WITH sc AS (SELECT COUNT(*) AS s FROM supplier),
ps0 AS (
  SELECT DISTINCT p_partkey AS ps_partkey,
         (p_partkey + i * (s // 4 + p_partkey // s)) % s AS ps_suppkey
  FROM part CROSS JOIN sc CROSS JOIN (SELECT UNNEST([0,1,2,3]) AS i) g
),
partsupp AS (
  SELECT ps_partkey, ps_suppkey,
         (ps_partkey * 17 + ps_suppkey * 19) % 9999 + 1 AS ps_availqty,
         ((ps_partkey * 7 + ps_suppkey * 13) % 90000 + 10000) / 100.0
           AS ps_supplycost
  FROM ps0
)
"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of ``_PARTSUPP_CTE`` — map-side explode of part × 4 plus
    one dimension-scale dedup shuffle.  partsupp is part-ratio (4 rows per
    part), so downstream joins treat it as a broadcastable dimension at
    bench scale; a 100 TB deployment with a real multi-TB partsupp would
    shuffle-join on (ps_partkey, ps_suppkey) instead — the query trees
    below only change the broadcast hint."""
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    scount = load_table(spark, sf_dir, "supplier").agg(
        F.count(F.lit(1)).alias("s")
    )
    stride = F.expr("s DIV 4") + F.expr("p_partkey DIV s")
    ps0 = (
        part.crossJoin(F.broadcast(scount))
        .select(
            "p_partkey",
            "s",
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i"),
        )
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            ((F.col("p_partkey") + F.col("i") * stride) % F.col("s")).alias(
                "ps_suppkey"
            ),
        )
        .distinct()
    )
    return ps0.select(
        "ps_partkey",
        "ps_suppkey",
        ((F.col("ps_partkey") * 17 + F.col("ps_suppkey") * 19) % 9999 + 1).alias(
            "ps_availqty"
        ),
        (
            ((F.col("ps_partkey") * 7 + F.col("ps_suppkey") * 13) % 90000 + 10000)
            / F.lit(100.0)
        ).alias("ps_supplycost"),
    )


@query(
    "tpch_q2",
    oracle=_PARTSUPP_CTE
    + """
, cand AS (
  SELECT s_acctbal, s_name, n_name, ps_partkey, p_brand, ps_supplycost,
         ps_suppkey,
         MIN(ps_supplycost) OVER (PARTITION BY ps_partkey) AS mincost
  FROM partsupp
  JOIN supplier ON ps_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
  JOIN part ON ps_partkey = p_partkey
  WHERE p_size BETWEEN 10 AND 20 AND p_type = 'ECONOMY'
)
SELECT s_acctbal, s_name, n_name, ps_partkey AS p_partkey, p_brand,
       ps_supplycost, ps_suppkey
FROM cand WHERE ps_supplycost = mincost
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, ps_suppkey
LIMIT 100
""",
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 minimum-cost supplier: for ECONOMY parts sized 10-20, the
    EUROPE supplier(s) quoting each part's regional minimum supplycost
    (trimmed schema: p_brand stands in for p_mfgr; no address/phone
    columns exist).

    Plan: partsupp is part-ratio so the supplier/nation/region dims
    broadcast into it; the per-part regional minimum is a window MIN
    over the already-filtered candidate set (no self-join, no correlated
    subquery re-scan — the classic Q2 spelling re-reads partsupp).  The
    LIMIT 100 cut carries a total ORDER (acctbal desc, names, partkey,
    suppkey), so the kept set is deterministic at every SF and both
    engines pick identical rows."""
    ps = _partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "ECONOMY")
    )
    cand = (
        ps.join(F.broadcast(supp), ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .join(F.broadcast(reg), F.col("n_regionkey") == reg.r_regionkey)
        .join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .select(
            "s_acctbal", "s_name", "n_name", "ps_partkey", "p_brand",
            "ps_supplycost", "ps_suppkey",
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("ps_partkey")
    return (
        cand.withColumn("mincost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("mincost"))
        .select(
            "s_acctbal", "s_name", "n_name",
            F.col("ps_partkey").alias("p_partkey"),
            "p_brand", "ps_supplycost", "ps_suppkey",
        )
        .orderBy(
            F.desc("s_acctbal"), "n_name", "s_name", "p_partkey", "ps_suppkey"
        )
        .limit(100)
    )


@query(
    "tpch_q9",
    oracle=_PARTSUPP_CTE
    + f"""
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
       {oracle_dsum('l_extendedprice * (1 - l_discount)'
                    ' - ps_supplycost * l_quantity', 'sum_profit')}
FROM lineitem
JOIN partsupp ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
JOIN part ON p_partkey = l_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 product-type profit: revenue minus supply cost for '%red%'
    parts, by supplier nation and order year.  The (l_partkey,
    l_suppkey)→partsupp join is the query's point: it keys the fact
    table on the COMPOSITE partsupp PK (the fixture's lineitem draws
    suppliers independently, so the join also acts as a ~4/S filter —
    both engines see the identical derived table, so the hash stays
    exact).

    Plan: one fact scan; partsupp/part/supplier/nation broadcast at
    dimension ratio; orders joins on the fact spine shuffle.  Profit
    routes through the §5.4 decimal discipline (both products are
    ≤6-decimal-exact doubles computed by the same IEEE ops)."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = _partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    ).select("p_partkey")
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = F.expr(
        "l_extendedprice * (1 - l_discount) - ps_supplycost * l_quantity"
    )
    return (
        li.join(
            F.broadcast(ps),
            (li.l_partkey == ps.ps_partkey) & (li.l_suppkey == ps.ps_suppkey),
        )
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(dsum(profit, "sum_profit"))
        .orderBy("nation", "o_year")
    )


@query(
    "tpch_q11",
    oracle=_PARTSUPP_CTE
    + """
, natps AS (
  SELECT ps_partkey, CAST(ps_supplycost * ps_availqty AS DECIMAL(24,8)) AS v
  FROM partsupp
  JOIN supplier ON ps_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_nationkey % 5 = 3
),
tot AS (SELECT SUM(v) AS t, COUNT(DISTINCT ps_partkey) AS np FROM natps)
SELECT ps_partkey, CAST(ROUND(SUM(v), 2) AS DOUBLE) AS value
FROM natps CROSS JOIN tot
GROUP BY ps_partkey, t, np
HAVING SUM(v) * np > 2 * t
ORDER BY value DESC, ps_partkey
""",
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 important stock: parts whose inventory value (supplycost ×
    availqty) held by nation-group-3 suppliers exceeds 2× the average
    part's value in that group (the classic 0.0001/SF fraction spelled
    scale-free: a fixed fraction goes empty as the part count grows —
    at sf0.1 the 1/1000 threshold selected zero parts).

    Determinism: the HAVING threshold compares EXACT decimals — group
    sums and the grand total are DECIMAL(24,8) integer arithmetic and
    the guard is ``sum*n_parts > 2*total`` so no engine ever
    materializes a fractional double.  Plan: one pass builds the
    (partkey → value) table, a 1-row global sum broadcasts back over
    it; no second scan of partsupp (the classic spelling re-reads it in
    a scalar subquery)."""
    ps = _partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_nationkey") % 5 == 3
    )
    natps = (
        ps.join(F.broadcast(supp), ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .select(
            "ps_partkey",
            (F.col("ps_supplycost") * F.col("ps_availqty"))
            .cast("decimal(24,8)")
            .alias("v"),
        )
        # consumed twice (group sums + grand total): pin the shared
        # intermediate so part/supplier are scanned once, not per branch
        .localCheckpoint(eager=False)
    )
    grp = natps.groupBy("ps_partkey").agg(F.sum("v").alias("sv"))
    tot = natps.agg(
        F.sum("v").alias("t"),
        F.countDistinct("ps_partkey").alias("np"),
    )
    return (
        grp.crossJoin(F.broadcast(tot))
        .filter(F.col("sv") * F.col("np") > 2 * F.col("t"))
        .select(
            "ps_partkey",
            F.round(F.col("sv"), 2).cast("double").alias("value"),
        )
        .orderBy(F.desc("value"), "ps_partkey")
    )


@query(
    "tpch_q20",
    oracle=_PARTSUPP_CTE
    + """
, shipped AS (
  SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS BIGINT)) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY 1, 2
)
SELECT DISTINCT s_suppkey, s_name, n_name
FROM partsupp
JOIN part ON p_partkey = ps_partkey AND p_name LIKE 'small%'
JOIN shipped ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
JOIN supplier ON ps_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey AND n_nationkey % 5 = 2
WHERE 2 * ps_availqty > qty
ORDER BY s_suppkey
""",
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 potential part promotion: nation-group-2 suppliers whose
    stock of 'small%' parts exceeds half of what they shipped in 1997
    (trimmed: no s_address; key + name + nation identify the supplier).

    Determinism: the half-of-shipped comparison is exact integer math —
    quantities sum as BIGINT and the guard is ``2*availqty > qty``
    (never 0.5 as a double).  Plan: the only fact-table work is one
    pushed-down-filtered scan pre-aggregated to (part, supp) BEFORE any
    join (map-side combine shrinks the spine to partsupp ratio);
    everything after is broadcast joins + DISTINCT on a 100-row
    supplier set."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("qty")
    )
    ps = _partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_nationkey") % 5 == 2
    ).select("n_nationkey", "n_name")
    return (
        shipped.join(
            F.broadcast(ps),
            (shipped.l_partkey == ps.ps_partkey)
            & (shipped.l_suppkey == ps.ps_suppkey),
        )
        .join(F.broadcast(part), F.col("ps_partkey") == part.p_partkey)
        .join(F.broadcast(supp), F.col("ps_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .filter(2 * F.col("ps_availqty") > F.col("qty"))
        .select("s_suppkey", "s_name", "n_name")
        .distinct()
        .orderBy("s_suppkey")
    )
