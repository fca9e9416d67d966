"""Data-quality operators (SURVEY.md §2.16): profiling + constraint
checks — the Deequ/Great-Expectations layer a training-data pipeline
runs BEFORE any model sees the data.

Both keys are deliberately single-pass: ``dq_profile`` computes every
per-column measure in ONE aggregate over the table (Spark's multi-
distinct Expand), then unpivots the single result row driver-free with
``inline`` — profiling 100 TB costs one scan, not one scan per column.
``dq_constraints`` folds all row-local predicates into the same single
aggregate and spends shuffles only on the two checks that genuinely
need them (referential integrity = anti-joins on the key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreaming_spark.io import EVENTS_ORACLE_CTE, load_table
from kafkastreaming_spark.registry import query

_NULL_D = "CAST(NULL AS DOUBLE)"
_NULL_V = "CAST(NULL AS VARCHAR)"


@query(
    "dq_profile",
    oracle=f"""
    WITH s AS (
      SELECT COUNT(*) AS n,
             COUNT(o_custkey) AS c1, COUNT(DISTINCT o_custkey) AS d1,
             MIN(o_custkey) AS mn1, MAX(o_custkey) AS mx1,
             COUNT(o_totalprice) AS c2, COUNT(DISTINCT o_totalprice) AS d2,
             MIN(o_totalprice) AS mn2, MAX(o_totalprice) AS mx2,
             COUNT(o_orderstatus) AS c3, COUNT(DISTINCT o_orderstatus) AS d3,
             MIN(o_orderstatus) AS mn3, MAX(o_orderstatus) AS mx3,
             COUNT(o_orderpriority) AS c4,
             COUNT(DISTINCT o_orderpriority) AS d4,
             MIN(o_orderpriority) AS mn4, MAX(o_orderpriority) AS mx4,
             COUNT(o_orderdate) AS c5, COUNT(DISTINCT o_orderdate) AS d5
      FROM orders
    )
    SELECT 'o_custkey' AS col_name, n AS n_rows, n - c1 AS n_nulls,
           d1 AS n_distinct, CAST(mn1 AS DOUBLE) AS min_num,
           CAST(mx1 AS DOUBLE) AS max_num, {_NULL_V} AS min_str,
           {_NULL_V} AS max_str FROM s
    UNION ALL
    SELECT 'o_totalprice', n, n - c2, d2, mn2, mx2, {_NULL_V}, {_NULL_V}
    FROM s
    UNION ALL
    SELECT 'o_orderstatus', n, n - c3, d3, {_NULL_D}, {_NULL_D}, mn3, mx3
    FROM s
    UNION ALL
    SELECT 'o_orderpriority', n, n - c4, d4, {_NULL_D}, {_NULL_D}, mn4, mx4
    FROM s
    UNION ALL
    SELECT 'o_orderdate', n, n - c5, d5, {_NULL_D}, {_NULL_D},
           {_NULL_V}, {_NULL_V} FROM s
    """,
)
def dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profile of the orders table — per column: row/null/exact-
    distinct counts plus typed min/max (numeric columns fill min_num/
    max_num, string columns min_str/max_str, the timestamp column counts
    only — cross-engine timestamp-to-string formatting is a hash trap
    this schema sidesteps by design).

    Two passes, cross-joined 1-row results (r12 restructure): the
    plain measures (counts/min/max — all map-side partial, shuffle =
    one row per partition) in one scan, the five exact
    ``count(distinct)``s in a second.  The single-scan spelling that
    fuses them is 3× SLOWER measured (2.3 s vs 0.8 s at sf0.1): the
    multi-distinct Expand replicates every row 6× and drags the 17
    plain-agg buffers through every replica, so "one scan" loses to
    "two cheap scans" — columnar scan cost is linear in bytes while
    Expand cost is 6× row processing.  At 100 TB the second scan
    disappears entirely: swap the exact distincts for HLL
    (``agg_approx_distinct``) and the profile is one Expand-free pass.
    ``inline`` unpivots the joined 1-row result into the five-row
    long-format profile with zero extra jobs."""
    o = load_table(spark, sf_dir, "orders")
    n = F.count(F.lit(1)).alias("n")
    plain = o.agg(
        n,
        F.count("o_custkey").alias("c1"),
        F.min("o_custkey").alias("mn1"),
        F.max("o_custkey").alias("mx1"),
        F.count("o_totalprice").alias("c2"),
        F.min("o_totalprice").alias("mn2"),
        F.max("o_totalprice").alias("mx2"),
        F.count("o_orderstatus").alias("c3"),
        F.min("o_orderstatus").alias("mn3"),
        F.max("o_orderstatus").alias("mx3"),
        F.count("o_orderpriority").alias("c4"),
        F.min("o_orderpriority").alias("mn4"),
        F.max("o_orderpriority").alias("mx4"),
        F.count("o_orderdate").alias("c5"),
    )
    # r17 (VERDICT r16 item 7): five SINGLE-distinct subtrees replace the
    # one 5-way multi-distinct — a multi-distinct plans an Expand that
    # replicates every row 5x before the partial agg, while a single
    # distinct plans a plain partial groupBy on the one column, so each
    # subtree scans and shuffles exactly one pruned column and the Expand
    # disappears from the plan entirely.  The subtrees cross-join into
    # the same one-row result and run concurrently inside one job.
    # A/B 5/5 pairs faster, median ratio 0.75; values identical.
    distincts = None
    for i, c in enumerate(
        (
            "o_custkey",
            "o_totalprice",
            "o_orderstatus",
            "o_orderpriority",
            "o_orderdate",
        ),
        1,
    ):
        d = o.agg(F.count_distinct(c).alias(f"d{i}"))
        distincts = d if distincts is None else distincts.crossJoin(d)
    agg = plain.crossJoin(distincts)
    nd = F.lit(None).cast("double")
    ns = F.lit(None).cast("string")

    def prof(name, cnt, dist, mn_num, mx_num, mn_str, mx_str):
        return F.struct(
            F.lit(name).alias("col_name"),
            F.col("n").alias("n_rows"),
            (F.col("n") - F.col(cnt)).alias("n_nulls"),
            F.col(dist).alias("n_distinct"),
            mn_num.alias("min_num"),
            mx_num.alias("max_num"),
            mn_str.alias("min_str"),
            mx_str.alias("max_str"),
        )

    d = F.col  # noqa: E741 — local shorthand
    return agg.select(
        F.inline(
            F.array(
                prof("o_custkey", "c1", "d1",
                     d("mn1").cast("double"), d("mx1").cast("double"), ns, ns),
                prof("o_totalprice", "c2", "d2", d("mn2"), d("mx2"), ns, ns),
                prof("o_orderstatus", "c3", "d3", nd, nd, d("mn3"), d("mx3")),
                prof("o_orderpriority", "c4", "d4", nd, nd,
                     d("mn4"), d("mx4")),
                prof("o_orderdate", "c5", "d5", nd, nd, ns, ns),
            )
        )
    )


@query(
    "dq_constraints",
    oracle="""
    WITH row_checks AS (
      SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) AS pk_dup,
             COUNT(*) FILTER (WHERE o_totalprice IS NULL
                              OR o_totalprice <= 0) AS bad_price,
             COUNT(*) FILTER (WHERE o_orderstatus IS NULL
                              OR o_orderstatus NOT IN ('O','F','P'))
               AS bad_status,
             COUNT(*) FILTER (WHERE o_orderdate IS NULL
                              OR o_orderdate <  TIMESTAMP '1992-01-01'
                              OR o_orderdate >= TIMESTAMP '2031-01-01')
               AS bad_date
      FROM orders
    ),
    checks AS (
      SELECT 'orders_pk_unique' AS check_name, pk_dup AS n_violations
      FROM row_checks
      UNION ALL
      SELECT 'totalprice_positive', bad_price FROM row_checks
      UNION ALL
      SELECT 'status_accepted_values', bad_status FROM row_checks
      UNION ALL
      SELECT 'orderdate_in_range', bad_date FROM row_checks
      UNION ALL
      SELECT 'orders_fk_customer', COUNT(*) FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM customer c
                        WHERE c.c_custkey = o.o_custkey)
      UNION ALL
      SELECT 'lineitem_fk_orders', COUNT(*) FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_orderkey = l.l_orderkey)
    )
    SELECT check_name, n_violations, n_violations = 0 AS passed
    FROM checks
    """,
)
def dq_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style constraint suite over orders/lineitem/customer: key
    uniqueness, two referential-integrity checks, and three row-local
    validity rules — output one row per check with its violation count
    and pass flag (a pipeline gates ingestion on ``min(passed)``).

    Cost model, the part that matters at 100 TB: the four row-local
    checks (PK duplicate count via exact ``count(distinct)``, price /
    status / date validity via conditional counts) all fold into ONE
    aggregate = one scan of orders; only the two FK checks pay a
    shuffle, each the canonical LEFT ANTI join on the key (null-
    producing side pruned by Catalyst to the join key column).  The
    whole suite is declarative — one union'd plan, no driver-side
    scalar collection, so a scheduler can run it as a single job."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")

    def cnt_if(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    row_checks = o.agg(
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).alias("pk_dup"),
        cnt_if(
            F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0)
        ).alias("bad_price"),
        cnt_if(
            F.col("o_orderstatus").isNull()
            | ~F.col("o_orderstatus").isin("O", "F", "P")
        ).alias("bad_status"),
        cnt_if(
            F.col("o_orderdate").isNull()
            | (F.col("o_orderdate") < F.lit("1992-01-01").cast("timestamp"))
            | (F.col("o_orderdate") >= F.lit("2031-01-01").cast("timestamp"))
        ).alias("bad_date"),
    ).select(
        F.inline(
            F.array(
                F.struct(
                    F.lit("orders_pk_unique").alias("check_name"),
                    F.col("pk_dup").alias("n_violations"),
                ),
                F.struct(
                    F.lit("totalprice_positive").alias("check_name"),
                    F.col("bad_price").alias("n_violations"),
                ),
                F.struct(
                    F.lit("status_accepted_values").alias("check_name"),
                    F.col("bad_status").alias("n_violations"),
                ),
                F.struct(
                    F.lit("orderdate_in_range").alias("check_name"),
                    F.col("bad_date").alias("n_violations"),
                ),
            )
        )
    )
    fk_cust = (
        o.join(c, o["o_custkey"] == c["c_custkey"], "left_anti")
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(F.lit("orders_fk_customer").alias("check_name"), "n_violations")
    )
    fk_ord = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"], "left_anti")
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(F.lit("lineitem_fk_orders").alias("check_name"), "n_violations")
    )
    return (
        row_checks.unionByName(fk_cust)
        .unionByName(fk_ord)
        .withColumn("passed", F.col("n_violations") == 0)
    )


# PSI per-bin term: ONE string shared verbatim between the Spark plan and
# the DuckDB oracle (the events_ab_cuped discipline).  Inputs are exact
# int64 bin/total counts with +1/+10 Laplace smoothing over the fixed
# 10-bin grid (so no bin probability is ever 0); the double term is
# snapped to int NANOS before the cross-bin sum (events_entropy ln
# discipline), so the per-type PSI is an exact int64 reduction.
# NOTE the explicit DOUBLE casts: a bare `+ 1.0` literal is DECIMAL(2,1)
# in Spark SQL (not DOUBLE), silently flipping the whole ratio into
# decimal arithmetic with different rounding than DuckDB's — the
# divisions below must start from a DOUBLE numerator in both engines.
_PSI_TERM9 = (
    "CAST(ROUND((CAST(n_ref + 1 AS DOUBLE) / (nt_ref + 10)"
    " - CAST(n_cur + 1 AS DOUBLE) / (nt_cur + 10))"
    " * ln((CAST(n_ref + 1 AS DOUBLE) / (nt_ref + 10))"
    " / (CAST(n_cur + 1 AS DOUBLE) / (nt_cur + 10))) * 1e9) AS BIGINT)"
)


@query(
    "dq_drift",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE},
    b AS (
      SELECT (CAST(epoch_us(MIN(ts)) AS BIGINT)
              + CAST(epoch_us(MAX(ts)) AS BIGINT)) // 2 AS mid
      FROM events
    ),
    binned AS (
      SELECT event_type,
             LEAST(CAST(ROUND(value * 100) AS BIGINT) // 5000, 9) AS bin,
             CASE WHEN epoch_us(ts) < b.mid THEN 1 ELSE 0 END AS is_ref
      FROM events, b
    ),
    counts AS (
      SELECT event_type, bin,
             CAST(SUM(is_ref) AS BIGINT) AS n_ref,
             CAST(SUM(1 - is_ref) AS BIGINT) AS n_cur
      FROM binned GROUP BY event_type, bin
    ),
    grid AS (
      SELECT et.event_type, t.range AS bin
      FROM (SELECT DISTINCT event_type FROM binned) et
      CROSS JOIN range(10) t
    ),
    filled AS (
      SELECT g.event_type, g.bin,
             COALESCE(c.n_ref, 0) AS n_ref,
             COALESCE(c.n_cur, 0) AS n_cur,
             CAST(SUM(COALESCE(c.n_ref, 0)) OVER (PARTITION BY g.event_type)
                  AS BIGINT) AS nt_ref,
             CAST(SUM(COALESCE(c.n_cur, 0)) OVER (PARTITION BY g.event_type)
                  AS BIGINT) AS nt_cur
      FROM grid g LEFT JOIN counts c
        ON g.event_type = c.event_type AND g.bin = c.bin
    ),
    terms AS (
      SELECT event_type, n_ref, n_cur, nt_ref, nt_cur,
             {_PSI_TERM9} AS term9
      FROM filled
    )
    SELECT event_type,
           CAST(MAX(nt_ref) AS BIGINT) AS n_ref,
           CAST(MAX(nt_cur) AS BIGINT) AS n_cur,
           CAST(SUM(term9) AS BIGINT) / 1e9 AS psi,
           CAST(SUM(term9) AS BIGINT) > 200000000 AS drifted
    FROM terms GROUP BY event_type
    """,
)
def dq_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift monitor: per event_type, the PSI
    of the value distribution between the first and second half of the
    event span (the midpoint discipline of events_ab_cuped), over a
    FIXED 10-bin cent grid (50-unit buckets, top bucket open) with
    +1/+10 Laplace smoothing so empty bins stay defined.  PSI > 0.2 is
    the conventional "significant drift — retrain / investigate" line;
    this is the check a feature store runs before every training run.

    Exactness: bin membership is integer math on exact cents; per-bin
    PSI terms are doubles from ONE shared expression string snapped to
    int nanos BEFORE the cross-bin sum (events_entropy discipline), so
    the per-type PSI is an exact int64 reduction and the drift flag
    compares unrounded scaled integers.

    Plan/scale: one events-scan aggregate on (event_type, bin) —
    map-side combined to ≤ types×10 rows — then grid fill + window
    totals on a table whose size is the type count, not the event
    count.  At 100 TB this is a single pruned scan; the grid is fixed,
    so the shuffle is bounded by cardinality(event_type)×10."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        (
            (F.unix_micros(F.min("ts")) + F.unix_micros(F.max("ts")))
            / F.lit(2)
        ).cast("long").alias("mid")
    )
    vc = F.round(F.col("value") * 100).cast("long")
    binned = ev.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.least(F.expr("CAST(ROUND(value * 100) AS BIGINT) div 5000"), F.lit(9))
        .alias("bin"),
        F.when(F.unix_micros("ts") < F.col("mid"), 1).otherwise(0).alias("is_ref"),
    )
    counts = (
        binned.groupBy("event_type", "bin")
        .agg(
            F.sum("is_ref").cast("long").alias("n_ref"),
            F.sum(F.lit(1) - F.col("is_ref")).cast("long").alias("n_cur"),
        )
        # ≤ types×10 rows, consumed by the grid-fill join AND (via the
        # distinct below) the type list; unpinned, both re-ran the
        # events scan + bin aggregate (r8 plan audit batch 3)
        .localCheckpoint(eager=False)
    )
    grid = (
        counts.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(spark.range(10).select(F.col("id").alias("bin"))))
    )
    from pyspark.sql import Window

    wt = Window.partitionBy("event_type")
    filled = (
        grid.join(counts, ["event_type", "bin"], "left")
        .select(
            "event_type",
            "bin",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
        .select(
            "event_type",
            "bin",
            "n_ref",
            "n_cur",
            F.sum("n_ref").over(wt).cast("long").alias("nt_ref"),
            F.sum("n_cur").over(wt).cast("long").alias("nt_cur"),
        )
    )
    terms = filled.selectExpr(
        "event_type", "n_ref", "n_cur", "nt_ref", "nt_cur",
        f"{_PSI_TERM9} AS term9",
    )
    return terms.groupBy("event_type").agg(
        F.max("nt_ref").cast("long").alias("n_ref"),
        F.max("nt_cur").cast("long").alias("n_cur"),
        (F.sum("term9").cast("long") / F.lit(1e9)).alias("psi"),
        (F.sum("term9").cast("long") > 200000000).alias("drifted"),
    )


# dq_table_diff's synthesized "v2" snapshot: deterministic mutations of
# orders — drops, two kinds of column edits, and inserts — shared as one
# SQL string (pure int/string ops, both dialects).
_DIFF_V2 = (
    "SELECT o_orderkey,"
    " CASE WHEN o_orderkey % 7 = 0 THEN 'X' ELSE o_orderstatus END"
    "   AS o_orderstatus,"
    " CASE WHEN o_orderkey % 11 = 0"
    "      THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) + 100"
    "      ELSE CAST(ROUND(o_totalprice * 100) AS BIGINT) END AS price_cents"
    " FROM orders WHERE o_orderkey % 13 <> 0"
    " UNION ALL "
    "SELECT o_orderkey + 1000000000 AS o_orderkey,"
    " o_orderstatus,"
    " CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents"
    " FROM orders WHERE o_orderkey % 17 = 0"
)


@query(
    "dq_table_diff",
    oracle=f"""
    WITH v1 AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
      FROM orders
    ),
    v2 AS ({_DIFF_V2}),
    j AS (
      SELECT v1.o_orderkey AS k1, v2.o_orderkey AS k2,
             v1.o_orderstatus AS s1, v2.o_orderstatus AS s2,
             v1.price_cents AS p1, v2.price_cents AS p2
      FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
    )
    SELECT
      CAST(SUM(CASE WHEN k1 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
      CAST(SUM(CASE WHEN k2 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
      CAST(SUM(CASE WHEN k1 IS NOT NULL AND k2 IS NOT NULL
                     AND (s1 <> s2 OR p1 <> p2) THEN 1 ELSE 0 END) AS BIGINT)
        AS n_changed,
      CAST(SUM(CASE WHEN k1 IS NOT NULL AND k2 IS NOT NULL
                     AND s1 = s2 AND p1 = p2 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_unchanged,
      CAST(SUM(CASE WHEN k1 IS NOT NULL AND k2 IS NOT NULL AND s1 <> s2
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_status_changed,
      CAST(SUM(CASE WHEN k1 IS NOT NULL AND k2 IS NOT NULL AND p1 <> p2
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_price_changed
    FROM j
    """,
)
def dq_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (the data-diff every ingestion/backfill review
    runs): classify every key of two table versions as added / removed
    / changed / unchanged, with per-column change counts.  v2 is a
    deterministic mutation of orders (drop keys %13, flip status %7,
    bump price %11, insert cloned keys %17 shifted past the key space)
    so every class is non-empty and the expected counts are checkable
    arithmetic, not fixture trivia.

    Exactness: prices compare as cent ints (double equality across
    engines is the trap); all outputs are exact conditional int sums.

    Plan: ONE full outer sort-merge join on the key, then a single
    map-side-combined aggregate — the canonical diff shape.  At 100 TB
    both snapshots bucket by the key so the SMJ needs no exchange
    (sink_bucketed layout); per-column drill-down reuses the same join
    with a CASE per column, still one pass."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders")
    v1 = orders.selectExpr(
        "o_orderkey",
        "o_orderstatus",
        "CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents",
    )
    v2 = spark.sql(_DIFF_V2)
    j = v1.selectExpr(
        "o_orderkey AS k1", "o_orderstatus AS s1", "price_cents AS p1"
    ).join(
        v2.selectExpr(
            "o_orderkey AS k2", "o_orderstatus AS s2", "price_cents AS p2"
        ),
        F.col("k1") == F.col("k2"),
        "full_outer",
    )
    both = F.col("k1").isNotNull() & F.col("k2").isNotNull()
    s_diff = F.col("s1") != F.col("s2")
    p_diff = F.col("p1") != F.col("p2")
    return j.agg(
        F.sum(F.when(F.col("k1").isNull(), 1).otherwise(0))
        .cast("long").alias("n_added"),
        F.sum(F.when(F.col("k2").isNull(), 1).otherwise(0))
        .cast("long").alias("n_removed"),
        F.sum(F.when(both & (s_diff | p_diff), 1).otherwise(0))
        .cast("long").alias("n_changed"),
        F.sum(F.when(both & ~s_diff & ~p_diff, 1).otherwise(0))
        .cast("long").alias("n_unchanged"),
        F.sum(F.when(both & s_diff, 1).otherwise(0))
        .cast("long").alias("n_status_changed"),
        F.sum(F.when(both & p_diff, 1).otherwise(0))
        .cast("long").alias("n_price_changed"),
    )


@query(
    "dq_observe",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS price_cents,
           CAST(SUM(CASE WHEN CAST(ROUND(l_discount * 100) AS BIGINT) > 5
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_discounted,
           CAST(MIN(l_quantity) AS BIGINT) AS min_qty,
           CAST(MAX(l_quantity) AS BIGINT) AS max_qty
    FROM lineitem WHERE l_quantity >= 10
    """,
)
def dq_observe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-flight pipeline metrics via the Observation API
    (``df.observe``) — the Deequ/"metrics repository" pattern Spark
    ships natively: the five data-quality measures are computed DURING
    the write pass (a ``noop`` v2 sink here, the standard
    measure-without-landing harness), not by a second scan.  This is
    the production shape for "count what you wrote and alert on it":
    at 100 TB a separate metrics query would double the I/O bill; an
    observation is free — it piggybacks accumulator-style on the rows
    already flowing to the sink.

    The observed row is a ONE-row driver value by construction (that
    is the Observation contract, not a collect of data), re-emitted as
    the result DataFrame so the key stays hash-checked against the
    plain aggregate oracle.  Money snaps to cents and the discount cut
    compares cent ints — never raw doubles — per the cross-engine
    ratio discipline."""
    from pyspark.sql import Observation

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 10)
    obs = Observation("dq_observe")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "price_cents"
        ),
        F.sum(
            F.when(F.round(F.col("l_discount") * 100).cast("long") > 5, 1)
            .otherwise(0)
        ).cast("long").alias("n_discounted"),
        F.min("l_quantity").cast("long").alias("min_qty"),
        F.max("l_quantity").cast("long").alias("max_qty"),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [
            (
                m["n_rows"],
                m["price_cents"],
                m["n_discounted"],
                m["min_qty"],
                m["max_qty"],
            )
        ],
        "n_rows long, price_cents long, n_discounted long, "
        "min_qty long, max_qty long",
    )


@query(
    "dq_reconcile",
    oracle="""
    WITH li AS (
      SELECT l_orderkey,
             SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                      AS BIGINT)) AS li_cents,
             COUNT(*) AS n_lines
      FROM lineitem GROUP BY l_orderkey
    ),
    j AS (
      SELECT o.o_orderkey,
             CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS o_cents,
             li.li_cents, li.n_lines
      FROM orders o LEFT JOIN li ON o.o_orderkey = li.l_orderkey
    )
    SELECT CASE WHEN li_cents IS NULL THEN 'no_lines'
                WHEN li_cents = o_cents THEN 'exact'
                WHEN li_cents > o_cents THEN 'lines_over'
                ELSE 'lines_under' END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(COALESCE(n_lines, 0)) AS BIGINT) AS n_lines,
           CAST(SUM(ABS(COALESCE(li_cents, 0) - o_cents)) AS BIGINT)
             AS abs_gap_cents,
           CAST(MAX(ABS(COALESCE(li_cents, 0) - o_cents)) AS BIGINT)
             AS max_gap_cents
    FROM j GROUP BY 1 ORDER BY 1
    """,
)
def dq_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table reconciliation — the finance-close control every
    warehouse runs nightly: roll lineitem revenue up to its order,
    LEFT-join against the order header's stated total, and bucket every
    order as exact / lines_over / lines_under / no_lines with exact
    absolute-gap sums.  (On this synthetic fixture header totals and
    line sums are independently generated, so the gaps are real data —
    the point is the control's mechanics, not a zero result.)

    Headerless orders must SURVIVE into 'no_lines' — the LEFT join is
    the contract (an inner join hides exactly the rows an auditor wants
    to see).  All money compares as exact cent integers; no
    double-equality anywhere.

    Scale: one map-combined rollup on the fact table's natural key,
    then a same-key join the SMJ handles without a second exchange
    when both sides bucket by orderkey (sink_bucketed layout); the
    bucket aggregate is 4 rows."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.sum(
                F.round(
                    F.expr("l_extendedprice * (1 - l_discount)") * 100
                ).cast("bigint")
            ).alias("li_cents"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("o_cents"),
    )
    j = o.join(li, o.o_orderkey == li.l_orderkey, "left")
    bucket = (
        F.when(F.col("li_cents").isNull(), "no_lines")
        .when(F.col("li_cents") == F.col("o_cents"), "exact")
        .when(F.col("li_cents") > F.col("o_cents"), "lines_over")
        .otherwise("lines_under")
    )
    gap = F.abs(F.coalesce("li_cents", F.lit(0)) - F.col("o_cents"))
    return (
        j.select(bucket.alias("bucket"), "n_lines", gap.alias("gap"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.coalesce("n_lines", F.lit(0))).cast("long").alias("n_lines"),
            F.sum("gap").cast("long").alias("abs_gap_cents"),
            F.max("gap").cast("long").alias("max_gap_cents"),
        )
        .orderBy("bucket")
    )
