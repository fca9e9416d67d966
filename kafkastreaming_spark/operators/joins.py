"""Join operators (SURVEY.md §2.3).

Strategy notes for 100 TB (SURVEY.md §4):

* dimension joins (region/nation/customer) are explicitly ``broadcast()`` —
  no shuffle of the fact side at all.
* fact-fact equi joins rely on SortMergeJoin with AQE skew-split enabled;
  at scale you pre-bucket both sides on the join key
  (``bucketBy(N, key)``) to eliminate the shuffle entirely on repeat joins.
* the as-of join is a union + window rewrite — one shuffle on
  (user_id), no O(n²) pair blowup, state bounded by one row per stream —
  the idiomatic Spark spelling of a time-series merge join.
* the interval join keeps an equi key (user_id) so Spark plans SMJ with a
  range residual instead of a cartesian product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from kafkastreaming_spark.io import EVENTS_ORACLE_CTE, load_table
from kafkastreaming_spark.registry import query


@query(
    "join_broadcast",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal, n_name, r_name
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name IN ('ASIA', 'EUROPE')
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way dim join; both dims broadcast → zero shuffle of customer."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    return (
        c.join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "c_name", "c_acctbal", "n_name", "r_name")
    )


@query(
    "join_smj",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderstatus, l_linenumber, l_extendedprice
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_totalprice > 350000
    """,
)
def join_smj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large equi join — SortMergeJoin above the broadcast threshold.

    The o_totalprice filter is pushed below the join (Catalyst
    PushDownPredicates), so the shuffle carries only qualifying orders.
    The explicit ``merge`` hint pins SortMergeJoin — at 100 TB neither side
    fits the broadcast threshold, so this is the plan that ships; without
    the hint Catalyst would (correctly) broadcast the small filtered side
    at test scale and the query would no longer exercise the SMJ path.
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 350000)
    li = load_table(spark, sf_dir, "lineitem")
    return o.hint("merge").join(li, o.o_orderkey == li.l_orderkey).select(
        "o_orderkey", "o_totalprice", "o_orderstatus", "l_linenumber", "l_extendedprice"
    )


# Outer joins: the nullable numeric join outputs are cast to double on BOTH
# engines so the pandas/arrow representation of NULL agrees (nullable int64
# degrades differently in the two clients).
_OUTER_SELECT_SQL = """
    SELECT c_custkey, c_name, CAST(o_orderkey AS DOUBLE) AS o_orderkey_d,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice_d, o_orderpriority
"""


def _outer_join(spark: SparkSession, sf_dir: str, how: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, how).select(
        "c_custkey",
        "c_name",
        F.col("o_orderkey").cast("double").alias("o_orderkey_d"),
        F.col("o_totalprice").cast("double").alias("o_totalprice_d"),
        "o_orderpriority",
    )


@query(
    "join_left",
    oracle=_OUTER_SELECT_SQL
    + """
    FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
      ON c_custkey = o_custkey
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with no qualifying order."""
    return _outer_join(spark, sf_dir, "left")


@query(
    "join_right",
    oracle=_OUTER_SELECT_SQL
    + """
    FROM (SELECT * FROM orders WHERE o_totalprice > 400000) o
    RIGHT JOIN customer ON c_custkey = o_custkey
    """,
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join (orders on the left, customer preserved)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return o.join(c, c.c_custkey == o.o_custkey, "right").select(
        "c_custkey",
        "c_name",
        F.col("o_orderkey").cast("double").alias("o_orderkey_d"),
        F.col("o_totalprice").cast("double").alias("o_totalprice_d"),
        "o_orderpriority",
    )


@query(
    "join_full",
    oracle="""
    SELECT CAST(c_custkey AS DOUBLE) AS c_custkey_d, c_name,
           CAST(o_orderkey AS DOUBLE) AS o_orderkey_d,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice_d
    FROM (SELECT * FROM customer WHERE c_acctbal < 0) c
    FULL JOIN (SELECT * FROM orders WHERE o_totalprice > 450000) o
      ON c_custkey = o_custkey
    """,
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with unmatched rows on both sides."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") < 0)
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return c.join(o, c.c_custkey == o.o_custkey, "full").select(
        F.col("c_custkey").cast("double").alias("c_custkey_d"),
        "c_name",
        F.col("o_orderkey").cast("double").alias("o_orderkey_d"),
        F.col("o_totalprice").cast("double").alias("o_totalprice_d"),
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS — left-semi join emits each customer at most once."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS — left-anti join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@query(
    "join_cross",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of the two tiny dims (5 × 25 rows)."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@query(
    "join_theta",
    oracle="""
    SELECT o_orderkey, l_linenumber, o_orderdate, l_shipdate
    FROM orders JOIN lineitem
      ON o_orderkey = l_orderkey AND l_shipdate > o_orderdate + INTERVAL 90 DAY
    WHERE o_orderpriority = '1-URGENT'
    """,
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed equi + non-equi condition: SMJ on the equi key with the range
    predicate evaluated as a join residual (no cartesian explosion)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    li = load_table(spark, sf_dir, "lineitem")
    return o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
    ).select("o_orderkey", "l_linenumber", "o_orderdate", "l_shipdate")


@query(
    "join_asof",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE},
    p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id, p.ts, p.value, c.ts AS last_click_ts
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: per purchase, the most recent click at-or-before it.

    Spark has no native as-of join; the scalable rewrite is union-tag +
    running ``last(click_ts) ignoring nulls`` over (user_id; ts, kind):
    one shuffle on user_id, O(n log n) per partition, no self-join blowup.
    Clicks sort before purchases at identical timestamps (kind 0 < 1) to
    match DuckDB's inclusive ``p.ts >= c.ts`` semantics.
    100 TB note: this is the pattern for replaying unbounded event history;
    with streaming inputs the same semantics come from a stream-stream
    join with a time-range condition (stream_stream_join).
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("kind"),
        F.col("ts").alias("click_ts"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("double").alias("value"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("kind"),
        F.lit(None).cast("timestamp").alias("click_ts"),
        "event_id",
        "value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = clicks.unionByName(purchases).withColumn(
        "last_click_ts", F.last("click_ts", ignorenulls=True).over(w)
    )
    return tagged.filter(F.col("kind") == 1).select(
        "event_id", "user_id", "ts", "value", "last_click_ts"
    )


@query(
    "join_interval",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE},
    e AS (SELECT event_id, user_id, ts, event_type FROM events)
    SELECT e1.event_id AS left_id, e2.event_id AS right_id,
           e1.user_id AS user_id, e1.ts AS left_ts, e2.ts AS right_ts,
           e2.event_type AS right_type
    FROM e e1 JOIN e e2
      ON e1.user_id = e2.user_id
     AND e2.ts > e1.ts
     AND e2.ts <= e1.ts + INTERVAL 5 MINUTE
    WHERE e1.event_type = 'click'
    """,
)
def join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval self-join: events of the same user within (0, 5min] after a
    click.  The equi key (user_id) keeps this an SMJ with a range residual.
    At 100 TB: bucket both sides by user_id, or range-partition by time and
    join per time-slice to bound the residual scan."""
    ev = load_table(spark, sf_dir, "events")
    e1 = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("left_id"),
        F.col("user_id").alias("user_id"),
        F.col("ts").alias("left_ts"),
    )
    e2 = ev.select(
        F.col("event_id").alias("right_id"),
        F.col("user_id").alias("u2"),
        F.col("ts").alias("right_ts"),
        F.col("event_type").alias("right_type"),
    )
    return e1.join(
        e2,
        (e1.user_id == F.col("u2"))
        & (F.col("right_ts") > F.col("left_ts"))
        & (F.col("right_ts") <= F.col("left_ts") + F.expr("INTERVAL 5 MINUTES")),
    ).select("left_id", "right_id", "user_id", "left_ts", "right_ts", "right_type")


@query(
    "join_skew_salted",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE},
    dim AS (SELECT DISTINCT event_type, length(event_type) AS w FROM events)
    SELECT e.event_id, e.event_type, e.value, e.value * d.w AS weighted
    FROM events e JOIN dim d USING (event_type)
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join over a pathologically hot key — events.event_type has 5
    values, so an unsalted shuffle join lands ~20% of the fact table on
    single reducers.  Salting: the fact side derives salt = pmod(event_id,
    8), the dimension side replicates each row for all 8 salts, and the
    join key becomes (event_type, salt) — every hot key spreads over 8
    reducers, deterministically (plan-asserted: the exchange partitions on
    BOTH columns).

    This is the manual, layout-stable alternative to AQE's skew-join
    split, and the only option when BOTH sides are too big to broadcast
    and the skew is known ahead of time (AQE splits only what it observes
    at runtime).  The salt never escapes: the output and oracle are the
    plain join's."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        "value",
        F.pmod("event_id", F.lit(8)).cast("int").alias("salt"),
    )
    dim = (
        load_table(spark, sf_dir, "events")
        .select("event_type")
        .distinct()
        .withColumn("w", F.length("event_type"))
        .select("event_type", "w", F.explode(F.expr("sequence(0, 7)")).alias("salt"))
    )
    return (
        ev.join(dim.hint("merge"), ["event_type", "salt"])
        .select(
            "event_id",
            "event_type",
            "value",
            (F.col("value") * F.col("w")).alias("weighted"),
        )
    )


@query(
    "join_asof_forward",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE},
    p AS (SELECT event_id, user_id, ts, value FROM events
          WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id, p.ts, p.value, c.ts AS next_click_ts
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts <= c.ts
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: per purchase, the EARLIEST click at-or-after
    it — the "next event after" lookup (post-purchase behavior, next
    reading after a sensor fault).  Mirror of join_asof: same union-tag
    + running-carry rewrite, but the window runs time-DESCENDING so the
    carried click is the nearest following one; at identical timestamps
    clicks order before purchases (kind asc within ts desc), matching
    the oracle's inclusive ``p.ts <= c.ts``.  Same scale shape: one
    shuffle on user_id, no self-join."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("kind"),
        F.col("ts").alias("click_ts"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("double").alias("value"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("kind"),
        F.lit(None).cast("timestamp").alias("click_ts"),
        "event_id",
        "value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("kind").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = clicks.unionByName(purchases).withColumn(
        "next_click_ts", F.last("click_ts", ignorenulls=True).over(w)
    )
    return tagged.filter(F.col("kind") == 1).select(
        "event_id", "user_id", "ts", "value", "next_click_ts"
    )


@query(
    "join_asof_nearest",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE},
    p AS (SELECT event_id, user_id, ts, value FROM events
          WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
    b AS (
      SELECT p.event_id, p.user_id, p.ts, p.value, c.ts AS back_ts
      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    ),
    f AS (
      SELECT p.event_id, c.ts AS fwd_ts
      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts <= c.ts
    )
    SELECT b.event_id, b.user_id, b.ts, b.value,
           CASE
             WHEN b.back_ts IS NULL THEN f.fwd_ts
             WHEN f.fwd_ts IS NULL THEN b.back_ts
             WHEN date_diff('microsecond', b.back_ts, b.ts)
                  <= date_diff('microsecond', b.ts, f.fwd_ts)
               THEN b.back_ts
             ELSE f.fwd_ts
           END AS nearest_click_ts,
           CASE
             WHEN b.back_ts IS NULL AND f.fwd_ts IS NULL THEN NULL
             WHEN f.fwd_ts IS NULL THEN 'back'
             WHEN b.back_ts IS NULL THEN 'fwd'
             WHEN date_diff('microsecond', b.back_ts, b.ts)
                  <= date_diff('microsecond', b.ts, f.fwd_ts)
               THEN 'back'
             ELSE 'fwd'
           END AS direction
    FROM b JOIN f ON b.event_id = f.event_id
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join (pandas ``merge_asof(direction='nearest')``):
    per purchase, the click closest in time in EITHER direction, ties
    toward the backward match — sensor-alignment and feature-join
    semantics when "most recent" is too strict.

    One union-tag pass computes BOTH candidates over a single user_id
    shuffle: the running backward carry (``last ignoring nulls``, time
    ascending — join_asof's window) and the running forward carry
    (``first ignoring nulls`` over the time-ascending frame's future
    rows — join_asof_forward's, respelled as an UNBOUNDED FOLLOWING
    frame so both windows share ONE sort order and Exchange).  The
    nearest pick is then a per-row CASE on the two microsecond gaps —
    no second shuffle, no self-join.  At identical timestamps clicks
    sort before (backward) / after (forward) purchases via the kind
    tag, reproducing DuckDB's inclusive >= / <= ASOF semantics."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("kind"),
        F.col("ts").alias("click_ts"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("double").alias("value"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("kind"),
        F.lit(None).cast("timestamp").alias("click_ts"),
        "event_id",
        "value",
    )
    # forward candidates need clicks AFTER purchases at equal ts: use a
    # second tag column that orders clicks last, but keep ONE sort order
    # by exploiting frames: backward = kind 0 first (asc ts, kind);
    # forward = first click strictly ahead in the same order — a click
    # at the same ts has kind 0 < 1 and lands BEHIND the purchase, so
    # carry it separately via a same-ts column.
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    tagged = clicks.unionByName(purchases).select(
        "*",
        F.last("click_ts", ignorenulls=True).over(w_back).alias("back_ts"),
        F.first("click_ts", ignorenulls=True).over(w_fwd).alias("fwd_raw"),
    )
    # fwd_raw misses a click at the SAME ts (kind 0 sorts before the
    # purchase, so it's outside the CURRENT ROW..FOLLOWING frame) — but
    # that click is the back_ts with gap 0, which always wins the
    # nearest tie anyway, so correct fwd = COALESCE over the same-ts
    # case is unnecessary; gap comparison handles it.
    out = tagged.filter(F.col("kind") == 1)
    # microsecond gaps — cast("long") would truncate to SECONDS and
    # silently disagree with the oracle's date_diff('microsecond', ...)
    # on sub-second ties
    back_gap = F.unix_micros("ts") - F.unix_micros("back_ts")
    fwd_gap = F.unix_micros("fwd_raw") - F.unix_micros("ts")
    pick_back = F.col("fwd_raw").isNull() | (
        F.col("back_ts").isNotNull() & (back_gap <= fwd_gap)
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.when(pick_back, F.col("back_ts"))
        .otherwise(F.col("fwd_raw"))
        .alias("nearest_click_ts"),
        F.when(
            F.col("back_ts").isNull() & F.col("fwd_raw").isNull(),
            F.lit(None).cast("string"),
        )
        .when(pick_back, F.lit("back"))
        .otherwise(F.lit("fwd"))
        .alias("direction"),
    )


@query(
    "join_bloom",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_custkey, c_name, c_acctbal
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_acctbal > 9000
    """,
)
def join_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered fact join — the runtime-filter pattern Spark's
    AQE applies automatically (spark.sql.optimizer.runtime.bloomFilter;
    its ``bloom_filter_agg`` expression is optimizer-internal, not a
    callable SQL function) built from first principles: a k=2-hash,
    m=65536-bit Bloom filter over the selective build side (customers
    with c_acctbal > 9000, ~10%), materialized as a 1024-row
    (slot, bit_or-bitmap) table, broadcast, and used to prefilter
    orders BEFORE the shuffle join so ~90% of the fact side never
    enters the exchange.

    Hash-checkable by construction: bloom false positives are removed
    by the real join that follows, so the result is EXACTLY the plain
    join — the oracle is ordinary SQL with no bloom at all.  The final
    join is hinted merge (SMJ) so the bloom guards a genuine shuffle
    rather than disappearing into a broadcast plan at test scale.  At
    100 TB: m scales linearly with build cardinality (~1.44 m/n bits
    per key per hash for a target FPR), the bitmap table stays
    m/64 rows ≈ KBs–MBs broadcast, and shuffle volume drops by
    build-side selectivity — THE lever for selective fact-dim joins."""
    n_bits = 1 << 16  # m; scale with build-side count() in production
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_acctbal") > 9000
    )

    def bitpos(col, seed):
        h = F.xxhash64(F.lit(seed), col) if seed else F.xxhash64(col)
        return F.pmod(h, F.lit(n_bits).cast("long"))

    def slot_mask(poscol, prefix):
        # SQL shiftleft accepts a column shift amount; the PySpark
        # wrapper insists on a Python int, hence expr().
        return [
            F.expr(f"CAST({poscol} / 64 AS BIGINT)").alias(f"{prefix}_slot"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST({poscol} % 64 AS INT))"
            ).alias(f"{prefix}_mask"),
        ]

    key = F.col("c_custkey")
    bloom = (
        cust.select(
            F.explode(
                F.array(bitpos(key, None), bitpos(key, "b2"))
            ).alias("pos")
        )
        .select(*slot_mask("pos", "b"))
        .groupBy("b_slot")
        .agg(F.bit_or("b_mask").alias("b_bits"))
    )
    orders = load_table(spark, sf_dir, "orders")
    ok = F.col("o_custkey")
    pre = orders.select(
        "o_orderkey",
        "o_totalprice",
        "o_custkey",
        bitpos(ok, None).alias("pos1"),
        bitpos(ok, "b2").alias("pos2"),
    ).select(
        "o_orderkey",
        "o_totalprice",
        "o_custkey",
        *slot_mask("pos1", "h1"),
        *slot_mask("pos2", "h2"),
    )
    b1 = broadcast(bloom.withColumnRenamed("b_slot", "s1").withColumnRenamed("b_bits", "bits1"))
    b2 = broadcast(bloom.withColumnRenamed("b_slot", "s2").withColumnRenamed("b_bits", "bits2"))
    pre = (
        pre.join(b1, pre.h1_slot == b1.s1, "left")
        .join(b2, pre.h2_slot == b2.s2, "left")
        .filter(
            (F.col("bits1").bitwiseAND(F.col("h1_mask")) != 0)
            & (F.col("bits2").bitwiseAND(F.col("h2_mask")) != 0)
        )
        .select("o_orderkey", "o_totalprice", "o_custkey")
    )
    return (
        pre.hint("merge")
        .join(cust, pre.o_custkey == cust.c_custkey)
        .select(
            "o_orderkey", "o_totalprice", "c_custkey", "c_name", "c_acctbal"
        )
    )


@query(
    "join_range_bucket",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE},
    hours AS (
      SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n
      FROM events GROUP BY 1
    ),
    win AS (
      SELECT h AS w_start, h + INTERVAL 90 MINUTE AS w_end
      FROM hours ORDER BY n DESC, h LIMIT 20
    )
    SELECT w.w_start AS window_start, e.event_id, e.event_type
    FROM events e JOIN win w
      ON e.ts >= w.w_start AND e.ts < w.w_end
    """,
)
def join_range_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range join (NO equi key) made shuffle-joinable by bucketing —
    the classic range-join optimization (Databricks' RANGE_JOIN hint,
    Flink's interval join internals): events falling inside any of the
    20 busiest hours' [start, start+90min) campaign windows.

    Naively `e.ts BETWEEN w.start AND w.end` has no equality condition,
    so Spark plans BroadcastNestedLoopJoin — every event row tested
    against every window, O(n·m), and a hard wall the moment the
    interval side outgrows broadcast.  The rewrite: choose a bucket
    width (30 min) no larger than the minimum window length, explode
    each window to the 3 grid buckets it spans, map each event to its
    single bucket (floor(epoch/1800)), and equi-join ON BUCKET with the
    range predicate demoted to a residual filter.  Each (event, window)
    candidate pair now meets at exactly one bucket — no post-join dedup
    — and the join is a plain hash/SMJ equi join: at 100 TB with
    millions of windows both sides shuffle on the bucket key and the
    per-task work is |bucket| × |windows in bucket|, not n × m.
    The window side here is derived (top-20 hours by volume, tie-broken
    on the hour itself) to keep the key self-contained."""
    ev = load_table(spark, sf_dir, "events")
    win = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("w_start"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "w_start")
        .limit(20)
        .select(
            "w_start",
            (F.col("w_start") + F.expr("INTERVAL 90 MINUTES")).alias("w_end"),
        )
    )
    # 30-min bucket grid: a window spans exactly buckets b0..b0+2
    # (90 min, hour-aligned start); an event lives in exactly one.
    b0 = (F.unix_timestamp("w_start") / 1800).cast("long")
    win_b = win.select(
        "w_start", "w_end", F.explode(F.sequence(b0, b0 + 2)).alias("bucket")
    )
    ev_b = ev.select(
        "event_id",
        "event_type",
        "ts",
        (F.unix_timestamp("ts") / 1800).cast("long").alias("bucket"),
    )
    return (
        ev_b.join(win_b, "bucket")
        .filter((F.col("ts") >= F.col("w_start")) & (F.col("ts") < F.col("w_end")))
        .select(F.col("w_start").alias("window_start"), "event_id", "event_type")
    )


@query(
    "join_fuzzy",
    oracle="""
    WITH names AS (
      SELECT p_name AS name, COUNT(*) AS n_parts,
             regexp_extract(p_name, '([^ ]+)$', 1) AS block
      FROM part GROUP BY p_name
    )
    SELECT a.name AS name_a, b.name AS name_b,
           CAST(levenshtein(a.name, b.name) AS INT) AS lev,
           a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
    FROM names a JOIN names b
      ON a.block = b.block AND a.name < b.name
    WHERE levenshtein(a.name, b.name) <= 4
    """,
)
def join_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy join (entity resolution): near-duplicate product
    names within edit distance 4 — the record-linkage shape (Fellegi-
    Sunter blocking + string-distance verify) behind catalog matching
    and customer-record merge.

    Two scale disciplines compose: (1) DISTINCT-SHRINK first — the join
    runs on the name VOCABULARY (grouped with its part count), which is
    bounded by the generator's adjective×noun grammar, not the part
    count, so corpus growth leaves the pair scan unchanged (the
    llm_contamination trick); (2) BLOCKING — pairs form only within a
    cheap deterministic block key (the trailing noun token), turning
    the all-pairs O(V²) Levenshtein battery into Σ block² with the
    equality condition carrying the join.  An unblocked fuzzy join has
    NO equi key and degenerates to a nested loop — exactly the failure
    join_range_bucket pins for ranges, here solved by a semantic key
    instead of a grid."""
    names = (
        load_table(spark, sf_dir, "part")
        .groupBy(F.col("p_name").alias("name"))
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .withColumn("block", F.regexp_extract("name", "([^ ]+)$", 1))
    )
    a = names.select(
        F.col("name").alias("name_a"),
        F.col("n_parts").alias("n_parts_a"),
        "block",
    )
    b = names.select(
        F.col("name").alias("name_b"),
        F.col("n_parts").alias("n_parts_b"),
        "block",
    )
    return (
        a.join(b, "block")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("lev", F.levenshtein("name_a", "name_b").cast("int"))
        .filter(F.col("lev") <= 4)
        .select("name_a", "name_b", "lev", "n_parts_a", "n_parts_b")
    )


@query(
    "join_pit_multi",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE},
    p AS (SELECT event_id, user_id, ts, value FROM events
          WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts,
                 CAST(ROUND(value * 100) AS BIGINT) AS vc
          FROM events WHERE event_type = 'click'),
    er AS (SELECT user_id, ts FROM events WHERE event_type = 'error')
    SELECT p.event_id, p.user_id, p.ts, p.value,
           c.vc AS last_click_cents,
           c.ts AS last_click_ts,
           er.ts AS last_error_ts,
           CAST(epoch_us(p.ts) - epoch_us(er.ts) AS BIGINT)
             AS error_recency_us
    FROM p
    ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    ASOF LEFT JOIN er ON p.user_id = er.user_id AND p.ts >= er.ts
    """,
)
def join_pit_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time multi-feature join — the feature-store primitive:
    at each prediction point (a purchase), fetch the latest value of
    SEVERAL feature streams as of that instant with zero lookahead
    (here: last click spend + its timestamp, and last error timestamp
    with its recency).  Training-serving skew starts exactly where this
    join is done wrong.

    The oracle spells it as two chained ASOF joins.  The Spark plan is
    deliberately NOT two as-of joins: ALL feature streams and the spine
    union into one tagged stream and every feature becomes one more
    running ``last(_, ignorenulls=True)`` column over the SAME
    (user_id; ts, kind) window — N features cost ONE shuffle and ONE
    sort instead of N of each (the join_asof union trick, amortized).
    Feature rows sort before the spine at equal timestamps (kind 0 < 1)
    to match ASOF's inclusive ``>=``.  At 100 TB this is the difference
    between one event-history pass and one per feature table."""
    ev = load_table(spark, sf_dir, "events")
    vc = F.round(F.col("value") * 100).cast("long")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("kind"),
        vc.alias("f_click_vc"),
        F.col("ts").alias("f_click_ts"),
        F.lit(None).cast("timestamp").alias("f_error_ts"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("double").alias("value"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        "ts",
        F.lit(0).alias("kind"),
        F.lit(None).cast("long").alias("f_click_vc"),
        F.lit(None).cast("timestamp").alias("f_click_ts"),
        F.col("ts").alias("f_error_ts"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("double").alias("value"),
    )
    spine = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("kind"),
        F.lit(None).cast("long").alias("f_click_vc"),
        F.lit(None).cast("timestamp").alias("f_click_ts"),
        F.lit(None).cast("timestamp").alias("f_error_ts"),
        "event_id",
        "value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = (
        clicks.unionByName(errors)
        .unionByName(spine)
        .select(
            "*",
            F.last("f_click_vc", ignorenulls=True).over(w)
            .alias("last_click_cents"),
            F.last("f_click_ts", ignorenulls=True).over(w)
            .alias("last_click_ts"),
            F.last("f_error_ts", ignorenulls=True).over(w)
            .alias("last_error_ts"),
        )
    )
    return tagged.filter(F.col("kind") == 1).select(
        "event_id",
        "user_id",
        "ts",
        "value",
        "last_click_cents",
        "last_click_ts",
        "last_error_ts",
        (F.unix_micros("ts") - F.unix_micros("last_error_ts"))
        .alias("error_recency_us"),
    )


# Spatial-join synthesis (join_spatial_grid): integer point coords and
# rectangle bounds derived from the portable md5 hash (hashing.py) — all
# containment math is exact int64, so the join hash-checks exactly.
from kafkastreaming_spark.hashing import H2_DUCK as _SP_H2_DUCK
from kafkastreaming_spark.hashing import H2_SPARK as _SP_H2_SPARK
from kafkastreaming_spark.hashing import H_DUCK as _SP_H_DUCK
from kafkastreaming_spark.hashing import H_SPARK as _SP_H_SPARK

_SP_PT_X = "{h} % 10000"
_SP_CELL = 2000  # grid cell edge; rect max edge < cell ⇒ ≤ 2 cells/axis


@query(
    "join_spatial_grid",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE},
    pts AS (
      SELECT event_id,
             {_SP_H_DUCK.format(x="concat('px:', CAST(event_id AS VARCHAR))")}
               % 10000 AS x,
             {_SP_H2_DUCK.format(x="concat('px:', CAST(event_id AS VARCHAR))")}
               % 10000 AS y
      FROM events
    ),
    zones AS (
      SELECT n_nationkey AS zone_key,
             {_SP_H_DUCK.format(x="concat('zx:', CAST(n_nationkey AS VARCHAR))")}
               % 8000 AS xmin,
             {_SP_H_DUCK.format(x="concat('zx:', CAST(n_nationkey AS VARCHAR))")}
               % 8000
             + 500 +
             {_SP_H2_DUCK.format(x="concat('zx:', CAST(n_nationkey AS VARCHAR))")}
               % 1500 AS xmax,
             {_SP_H_DUCK.format(x="concat('zy:', CAST(n_nationkey AS VARCHAR))")}
               % 8000 AS ymin,
             {_SP_H_DUCK.format(x="concat('zy:', CAST(n_nationkey AS VARCHAR))")}
               % 8000
             + 500 +
             {_SP_H2_DUCK.format(x="concat('zy:', CAST(n_nationkey AS VARCHAR))")}
               % 1500 AS ymax
      FROM nation
    )
    SELECT p.event_id, z.zone_key, p.x, p.y
    FROM pts p JOIN zones z
      ON p.x BETWEEN z.xmin AND z.xmax
     AND p.y BETWEEN z.ymin AND z.ymax
    """,
)
def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial join (point-in-rectangle / geofencing): which events fall
    inside which of 25 synthesized zones.  Coordinates are exact int64
    grid units hashed from the row keys (portable md5), zone edges 500–
    2000 units on a 10000² plane — deterministic, so the whole join
    hash-checks.

    The oracle is the naive theta join (per-pair BETWEEN).  The Spark
    plan is the scalable GRID-BUCKET spelling every distributed spatial
    engine uses (Sedona/GeoMesa): the plane is cut into 2000-unit cells;
    each zone replicates into the ≤4 cells its bounding box covers
    (edge < cell size ⇒ ≤2 per axis), each point maps to EXACTLY ONE
    cell, and the join becomes an equi-join on cell_id with the exact
    containment test as a residual predicate — no nested-loop, no
    quadratic pair scan, and a point can never match the same zone via
    two cells (one cell per point ⇒ no post-join dedup needed).

    At this dim size Catalyst broadcasts the ~60-row replicated zone
    table (the right call); with millions of geofences the identical
    plan flips to a shuffled hash join on cell_id, which is exactly the
    partition-by-space layout a 100 TB spatial workload wants — skew
    from a hot cell salts like any hot key (join_skew_salted)."""
    ev = load_table(spark, sf_dir, "events")
    nation = load_table(spark, sf_dir, "nation")
    h_pt = _SP_H_SPARK.format(x="concat('px:', CAST(event_id AS STRING))")
    h2_pt = _SP_H2_SPARK.format(x="concat('px:', CAST(event_id AS STRING))")
    pts = ev.selectExpr(
        "event_id",
        f"{h_pt} % 10000 AS x",
        f"{h2_pt} % 10000 AS y",
    ).withColumn(
        "cell",
        (F.col("x") / _SP_CELL).cast("long") * 5
        + (F.col("y") / _SP_CELL).cast("long"),
    )
    hx = _SP_H_SPARK.format(x="concat('zx:', CAST(n_nationkey AS STRING))")
    h2x = _SP_H2_SPARK.format(x="concat('zx:', CAST(n_nationkey AS STRING))")
    hy = _SP_H_SPARK.format(x="concat('zy:', CAST(n_nationkey AS STRING))")
    h2y = _SP_H2_SPARK.format(x="concat('zy:', CAST(n_nationkey AS STRING))")
    zones = nation.selectExpr(
        "n_nationkey AS zone_key",
        f"{hx} % 8000 AS xmin",
        f"{hx} % 8000 + 500 + {h2x} % 1500 AS xmax",
        f"{hy} % 8000 AS ymin",
        f"{hy} % 8000 + 500 + {h2y} % 1500 AS ymax",
    )
    # replicate each zone into the grid cells its bbox covers (≤ 4)
    zcells = zones.select(
        "*",
        F.explode(
            F.sequence(
                (F.col("xmin") / _SP_CELL).cast("long"),
                (F.col("xmax") / _SP_CELL).cast("long"),
            )
        ).alias("cx"),
    ).select(
        "*",
        F.explode(
            F.sequence(
                (F.col("ymin") / _SP_CELL).cast("long"),
                (F.col("ymax") / _SP_CELL).cast("long"),
            )
        ).alias("cy"),
    ).withColumn("cell", F.col("cx") * 5 + F.col("cy"))
    joined = pts.join(
        broadcast(zcells),
        (pts["cell"] == zcells["cell"])
        & (pts["x"] >= zcells["xmin"])
        & (pts["x"] <= zcells["xmax"])
        & (pts["y"] >= zcells["ymin"])
        & (pts["y"] <= zcells["ymax"]),
    )
    return joined.select("event_id", "zone_key", "x", "y")


@query(
    "join_shuffle_hash",
    oracle="""
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_custs,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS bal_cents
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name
    """,
)
def join_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy HINT surface: the same dim join every other key
    lets Catalyst plan (it would broadcast nation) is here FORCED onto
    the SHUFFLE_HASH path via the hint API — the knob you reach for
    when the 'small' side is too big to broadcast but still fits a
    per-partition hash table, where the default SMJ would pay two
    sorts for nothing.

    The oracle is strategy-blind, so the hash pins that the physical
    strategy changes NO value (the planner-freedom contract);
    tests/test_plans.py pins that the hint actually took
    (ShuffledHashJoin node, no Broadcast/SortMerge).

    Scale note: SHUFFLE_HASH shines for medium-dim joins (10-500 MB a
    side) and skew-salted layouts; it loses to SMJ when the build side
    spills — which is why it is a HINT, not a default."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").hint("shuffle_hash")
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_custs"),
            F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint"))
            .cast("long")
            .alias("bal_cents"),
        )
        .orderBy("n_name")
    )
