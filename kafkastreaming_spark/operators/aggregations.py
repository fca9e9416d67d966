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
from kafkastreaming_spark.hashing import H_DUCK, H_SPARK
from kafkastreaming_spark.io import EVENTS_ORACLE_CTE, load_table, spread
from kafkastreaming_spark.memo import release_local_checkpoint
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
    # r16: project to the 6 agg columns, then repair input skew — the sf
    # fixtures are single-row-group files, so without `spread` the scan AND
    # the partial HashAggregate (7 double→decimal casts/row, the key's real
    # cost) fuse into ONE task (guide §2.5; measured 1.83→0.70 s on this
    # box).  On a healthy multi-row-group layout `spread` is a no-op and
    # the plan is the original scan→partial→exchange(4 groups)→final.
    filtered = li.filter(
        F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp")
    ).select(
        "l_returnflag", "l_linestatus", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax",
    )
    return (
        spread(filtered, key="l_extendedprice")
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


# --------------------------------------------------------------------------
# agg_global / distinct / having / hierarchies / stats / percentile / lists
# --------------------------------------------------------------------------

@query(
    "agg_global",
    oracle=f"""
    SELECT COUNT(*) AS n_rows,
           {oracle_dsum('l_quantity', 'sum_qty')},
           {oracle_davg('l_extendedprice', 'avg_price')},
           MIN(l_shipdate) AS min_ship,
           MAX(l_shipdate) AS max_ship,
           MIN(l_quantity) AS min_qty,
           MAX(l_quantity) AS max_qty
    FROM lineitem
    """,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped aggregate — collapses to a single row before the exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_quantity", "sum_qty"),
        davg("l_extendedprice", "avg_price"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


@query(
    "agg_count_distinct",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE}
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct per group (Expand + two-phase aggregate under AQE)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "agg_multi_distinct",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE}
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(DISTINCT CAST(ts AS DATE)) AS n_days
    FROM events GROUP BY event_type
    """,
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two distinct aggregates in one groupBy → Expand-based plan."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct(F.col("ts").cast("date")).alias("n_days"),
    )


@query(
    "agg_having",
    oracle=f"""
    SELECT o_custkey, COUNT(*) AS n_orders,
           {oracle_dsum('o_totalprice', 'total_spent')}
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 12
       AND CAST(ROUND(SUM(CAST((o_totalprice) AS DECIMAL(24,8))), 2) AS DOUBLE) > 2000000
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "total_spent"),
        )
        .filter((F.col("n_orders") >= 12) & (F.col("total_spent") > 2000000))
    )


def _revenue_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⨝ nation ⨝ region ⨝ orders revenue rows (dims broadcast)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("r_name", "n_name", "o_totalprice")
    )


_REVENUE_BASE_SQL = """
    base AS (
      SELECT r_name, n_name, o_totalprice
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    )
"""

_HIER_AGG_SQL = f"""
    SELECT r_name, n_name,
           CAST(GROUPING(r_name, n_name) AS BIGINT) AS gid,
           COUNT(*) AS n_orders,
           {oracle_dsum('o_totalprice', 'revenue')}
    FROM base
"""


def _revenue_partial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(r_name, n_name) pre-aggregate of the revenue base — the
    aggregate-before-Expand rewrite for the hierarchical-grouping keys.

    CUBE/ROLLUP/GROUPING SETS lower to Expand, which REPLICATES every
    input row once per grouping set BEFORE the shuffle — at 100 TB that
    multiplies shuffle volume by the set count.  Because COUNT and the
    exact-decimal SUM are algebraic, grouping over a (r_name, n_name)
    partial (≤ |nations| rows) is value-identical: partial decimal sums
    stay UNROUNDED (dsum rounds only once, at the final merge), and
    Expand replicates 25 rows instead of the orders table.  Catalyst
    does not perform this rewrite itself; the fixture has no NULL
    r_name/n_name, so data-NULL vs subtotal-NULL conflation (the one
    semantic hazard of aggregating below a cube) cannot arise."""
    return (
        _revenue_base(spark, sf_dir)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.col("o_totalprice").cast("decimal(24,8)")).alias("ps"),
        )
    )


def _hier_agg_merged(grouped) -> DataFrame:
    return grouped.agg(
        F.grouping_id().alias("gid"),
        F.sum("pn").alias("n_orders"),
        F.round(F.sum("ps"), 2).cast("double").alias("revenue"),
    )


@query(
    "agg_rollup",
    oracle=f"WITH {_REVENUE_BASE_SQL} {_HIER_AGG_SQL} GROUP BY ROLLUP(r_name, n_name)",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals: (r, n), (r), () with grouping_id bitmask —
    Expand runs over the (r_name, n_name) partial (_revenue_partial)."""
    part = _revenue_partial(spark, sf_dir)
    return _hier_agg_merged(part.rollup("r_name", "n_name"))


@query(
    "agg_cube",
    oracle=f"WITH {_REVENUE_BASE_SQL} {_HIER_AGG_SQL} GROUP BY CUBE(r_name, n_name)",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 4 grouping combinations of (r_name, n_name) — via the
    aggregate-before-Expand rewrite (see _revenue_partial): Expand
    replicates the 25-row partial, not the orders join."""
    part = _revenue_partial(spark, sf_dir)
    return _hier_agg_merged(part.cube("r_name", "n_name"))


@query(
    "agg_grouping_sets",
    oracle=f"""WITH {_REVENUE_BASE_SQL} {_HIER_AGG_SQL}
    GROUP BY GROUPING SETS ((r_name), (n_name))""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets: per-region and per-nation totals only —
    Expand runs over the (r_name, n_name) partial (_revenue_partial)."""
    part = _revenue_partial(spark, sf_dir)
    return _hier_agg_merged(
        part.groupingSets([["r_name"], ["n_name"]], "r_name", "n_name")
    )


@query(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(STDDEV_SAMP(l_quantity), 6) AS std_qty,
           ROUND(VAR_SAMP(l_quantity), 6) AS var_qty,
           ROUND(CORR(l_extendedprice, l_quantity), 6) AS corr_price_qty,
           ROUND(COVAR_SAMP(l_extendedprice, l_quantity), 6) AS covar_price_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates, rounded 6dp on both engines (SURVEY.md §5.4)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("std_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("corr_price_qty"),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 6).alias("covar_price_qty"),
    )


@query(
    "agg_percentile",
    oracle="""
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.25), 6) AS p25,
           ROUND(quantile_cont(o_totalprice, 0.50), 6) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.75), 6) AS p75,
           ROUND(median(o_totalprice), 6) AS med
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles + median per priority class."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", 0.25), 6).alias("p25"),
        F.round(F.percentile("o_totalprice", 0.50), 6).alias("p50"),
        F.round(F.percentile("o_totalprice", 0.75), 6).alias("p75"),
        F.round(F.median("o_totalprice"), 6).alias("med"),
    )


@query(
    "agg_collect",
    oracle="""
    SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation GROUP BY n_regionkey
    """,
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic list aggregation: collect → sort → join to string."""
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations")
    )


@query(
    "agg_approx_distinct",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           TRUE AS approx_within_5pct
    FROM main.events GROUP BY event_type
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate — the 100 TB substitute for exact
    countDistinct (no Expand, constant memory per group).

    Envelope-oracle spelling (r10, VERDICT r9 item 1): the HLL++ byte
    buffer is engine-specific, so the raw estimate can never hash-match
    DuckDB.  Instead the query emits the deterministic cross-engine
    facts — the exact distinct count and a boolean asserting the HLL
    estimate sits within ±max(5%, 2) of it — and the oracle computes
    the exact side plus a literal TRUE.  Spark's HLL++ is deterministic
    for fixed input (hash-based, no RNG), so the boolean is stable; at
    rsd=0.01 and fixture cardinalities the sparse encoding is exact.
    The exact countDistinct is the VERIFICATION side only; production
    reads just the sketch column (the whole point of the operator).

    Two-phase spelling (r13): pre-aggregating to (event_type, user_id)
    partials avoids the multi-distinct Expand (which replicates every
    input row per distinct clause) — exact = COUNT(user_id) of partials
    (null-excluding, matching COUNT(DISTINCT user_id) semantics: a NULL
    user_id forms its own partial group but must not count as a user —
    ADVICE r13), n_events = SUM of partial counts (COUNT(*) semantics,
    null rows included), and the HLL estimate is UNCHANGED over the
    deduplicated keys (duplicate insertions never move HLL registers;
    approx_count_distinct skips NULLs natively).  2.2× faster at sf0.1
    (2.59 → 1.17 s)."""
    ev = load_table(spark, sf_dir, "events")
    partial = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("_c")
    )
    g = partial.groupBy("event_type").agg(
        F.count(F.col("user_id")).cast("long").alias("exact_users"),
        F.sum("_c").cast("long").alias("n_events"),
        F.approx_count_distinct("user_id", 0.01).alias("_approx"),
    )
    return g.select(
        "event_type",
        "exact_users",
        "n_events",
        (
            F.abs(F.col("_approx") - F.col("exact_users"))
            <= F.greatest(F.col("exact_users") * 0.05, F.lit(2.0))
        ).alias("approx_within_5pct"),
    )


# KMV sketch size.  64 keeps BOTH branches (exact-below-k and estimate)
# live on the fixtures (150 distinct users per type); production uses
# k = 1024+ for ~3% standard error (1/sqrt(k-2)).
_KMV_K = 64
_KMV_SPACE = 1 << 60  # H() parses 15 hex chars -> uniform on [0, 2^60)

_KMV_H_SPARK = H_SPARK.format(x="CAST(user_id AS STRING)")
_KMV_H_DUCK = H_DUCK.format(x="CAST(user_id AS VARCHAR)")


@query(
    "agg_kmv_distinct",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT event_type, {_KMV_H_DUCK} AS hv
      FROM main.events
    ),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
      FROM h
    )
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS m,
           CASE WHEN COUNT(*) < {_KMV_K} THEN CAST(COUNT(*) AS BIGINT)
                ELSE CAST(ROUND(({_KMV_K} - 1) * {_KMV_SPACE}.0 / MAX(hv))
                          AS BIGINT)
           END AS est_distinct
    FROM r WHERE rn <= {_KMV_K} GROUP BY event_type
    """,
)
def agg_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct sketch — a cardinality estimator that,
    unlike HLL (`agg_approx_distinct`, rows-only), is DETERMINISTIC and
    exactly hash-checkable: both engines hash every value with the
    portable 60-bit md5 H(), keep the k smallest distinct hashes per
    group, and estimate |D| ≈ (k-1)·2^60/h_(k) (Bar-Yossef et al.,
    "Counting distinct elements in a data stream").  Below k distinct
    values the sketch IS the exact count (m < k branch).

    Scale shape: one distinct-shuffle on (group, hash) then a per-group
    top-k that Catalyst lowers to WindowGroupLimit — partial limiting
    BEFORE the shuffle, so each map task forwards at most k hashes per
    group regardless of input size; the kth-smallest-of-union equals
    kth-smallest-of-merged-partials, which is exactly why KMV sketches
    merge (the same property the partial limit exploits).  The only
    float op is one mul+div on identical inputs; ROUND lands ~1e17
    where doubles have integer ulp, so no half-case ambiguity."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.select(
        "event_type", F.expr(_KMV_H_SPARK).alias("hv")
    ).distinct()
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("hv")
    topk = h.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _KMV_K
    )
    agg = topk.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.max("hv").alias("kth"),
    )
    return agg.select(
        "event_type",
        "m",
        F.when(F.col("m") < _KMV_K, F.col("m"))
        .otherwise(
            F.round(
                F.lit(_KMV_K - 1) * F.lit(float(_KMV_SPACE)) / F.col("kth"), 0
            ).cast("long")
        )
        .alias("est_distinct"),
    )


@query(
    "agg_salted",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE}
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(24,8))), 2) AS DOUBLE) AS sum_value
    FROM events GROUP BY event_type
    """,
)
def agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation — the hand-rolled skew relief from
    SCALE.md, verified to produce EXACTLY the plain groupBy result.

    Phase 1 groups by (key, salt=pmod(hash(event_id), 16)) so one hot key
    spreads over 16 reducers; phase 2 merges the 16 partials.  Decimal
    partial sums stay exact through the merge, so the oracle is the plain
    single-phase aggregation.  At 100 TB this is the manual fallback when
    AQE skew-split can't help (e.g. skewed aggregation, not join)."""
    ev = load_table(spark, sf_dir, "events")
    phase1 = (
        ev.withColumn("salt", F.expr("pmod(hash(event_id), 16)"))
        .groupBy("event_type", "salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.col("value").cast("decimal(24,8)")).alias("ps"),
        )
    )
    return phase1.groupBy("event_type").agg(
        F.sum("pn").alias("n_events"),
        F.round(F.sum("ps"), 2).cast("double").alias("sum_value"),
    )


@query(
    "agg_mode",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE},
    counted AS (
      SELECT user_id, event_type, COUNT(*) AS n,
             ROW_NUMBER() OVER (
               PARTITION BY user_id
               ORDER BY COUNT(*) DESC, event_type) AS rn
      FROM events GROUP BY user_id, event_type
    )
    SELECT user_id, event_type AS mode_event_type, n
    FROM counted WHERE rn = 1
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode: each user's most frequent
    event_type, ties broken lexicographically.  Spark's built-in
    ``mode()`` breaks ties arbitrarily (expressly non-deterministic), so
    the portable spelling is count + ROW_NUMBER over (count DESC, value)
    — two hash-aggs and a per-user window, which Spark executes as
    WindowGroupLimit (only the top row per user is kept per partition,
    never the full rank materialization)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    counted = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("n"), "event_type")
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("mode_event_type"), "n")
    )


@query(
    "agg_bool",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE}
    SELECT event_type,
           bool_and(value > 1.0) AS all_above_1,
           bool_or(value > 99.0) AS any_above_99,
           CAST(count_if(value > 50.0) AS BIGINT) AS n_above_50,
           CAST(count_if(user_id % 2 = 0) AS BIGINT) AS n_even_users
    FROM events GROUP BY event_type
    """,
)
def agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregate surface: ``bool_and``/``bool_or`` (SQL EVERY /
    ANY) and ``count_if`` — the predicates-as-aggregates family used by
    data-quality assertions ("every row passed", "any row violated",
    "how many matched").  All three exist natively in BOTH engines
    (Spark and DuckDB), are order-insensitive, and reduce map-side to
    three booleans/longs per group — the cheapest possible shuffle."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("bool_and(value > 1.0D)").alias("all_above_1"),
        F.expr("bool_or(value > 99.0D)").alias("any_above_99"),
        F.expr("CAST(count_if(value > 50.0D) AS BIGINT)").alias("n_above_50"),
        F.expr("CAST(count_if(user_id % 2 = 0) AS BIGINT)").alias("n_even_users"),
    )


@query(
    "agg_sketch_partial",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE}
    SELECT event_type,
           CAST(COUNT(DISTINCT date_trunc('day', ts)) AS BIGINT) AS n_days,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS merge_within_5pct
    FROM events GROUP BY event_type
    """,
)
def agg_sketch_partial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable distinct-count sketches: per-(event_type, day)
    HLL sketches unioned up to per-type totals — the materialized-rollup
    pattern that makes 100 TB dashboards cheap.  An exact COUNT(DISTINCT)
    cannot roll up (distinct users per day don't sum to distinct users
    per month); a stored Datasketches HLL CAN — the daily cube is built
    once, and every coarser granularity is a tiny merge of byte-blob
    partials instead of a re-scan of the raw corpus.

    Two-level plan: hll_sketch_agg shuffles only fixed-size binary
    sketches (map-side partials collapse each partition first), then
    hll_union_agg merges |days| blobs per type.  Estimates are
    deterministic for fixed input (the sketch hash is seeded) but NOT
    portable to DuckDB's different HLL implementation — so the query
    emits the envelope facts instead (r10, VERDICT r9 item 1): exact
    n_days, exact distinct users, and a boolean asserting the merged
    daily-sketch estimate lands within ±max(5%, 2) of the exact count.
    The oracle computes both exact sides plus literal TRUE.  The exact
    countDistinct is verification-only; production persists the daily
    sketch cube and never re-scans."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id", 14).alias("sketch"))
    rolled = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("_est"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_users")
    )
    return (
        rolled.join(F.broadcast(exact), "event_type")
        .select(
            "event_type",
            "n_days",
            "exact_users",
            (
                F.abs(F.col("_est") - F.col("exact_users"))
                <= F.greatest(F.col("exact_users") * 0.05, F.lit(2.0))
            ).alias("merge_within_5pct"),
        )
        .orderBy("event_type")
    )


@query(
    "agg_linreg",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE},
    pts AS (
      SELECT event_type,
             (epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01')) // 3600000000
               AS xh,
             CAST(ROUND(value * 100) AS BIGINT) AS yc
      FROM events
    ),
    sums AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(xh) AS sx, SUM(yc) AS sy,
             SUM(xh * yc) AS sxy, SUM(xh * xh) AS sxx
      FROM pts GROUP BY event_type
    ),
    m AS (
      SELECT event_type, n,
             CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx,
             CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my,
             CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE) AS mxy,
             CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE) AS mxx
      FROM sums
    ),
    fit AS (
      -- NULLIF guards the degenerate single-hour-bucket group: both
      -- engines then yield NULL instead of engine-specific Inf/NaN text.
      SELECT event_type, n, mx, my,
             (mxy - mx * my) / NULLIF(mxx - mx * mx, 0.0) AS slope
      FROM m
    )
    SELECT event_type, n,
           ROUND(slope * 24.0 / 100.0, 6) AS slope_per_day,
           ROUND((my - slope * mx) / 100.0, 6) AS intercept
    FROM fit
    """,
)
def agg_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event_type linear trend of value over time (least-squares
    slope + intercept) — the "is this metric drifting" aggregate behind
    alerting and capacity dashboards.

    Why not ``regr_slope``: both engines have it, but both compute it in
    streaming double arithmetic whose accumulation order differs —
    cross-engine ULP roulette.  Instead the moments are EXACT integer
    sums (x = whole hours since 2024-01-01, y = value cents, both small
    enough that every sum stays below 2^53, so the decimal→double casts
    are exact), and slope/intercept are the identical IEEE expression
    tree in both engines rounded 6dp — the events_anomaly z-score
    discipline applied to regression.  One map-side-combined shuffle on
    a 5-value key; nothing else moves."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        F.expr(
            "(unix_micros(ts) - unix_micros(TIMESTAMP '2024-01-01'))"
            " div 3600000000"
        ).alias("xh"),
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("yc"),
    )
    sums = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xh").alias("sx"),
        F.sum("yc").alias("sy"),
        F.sum(F.expr("xh * yc")).alias("sxy"),
        F.sum(F.expr("xh * xh")).alias("sxx"),
    )
    n_d = F.col("n").cast("double")
    mx = F.col("sx").cast("double") / n_d
    my = F.col("sy").cast("double") / n_d
    mxy = F.col("sxy").cast("double") / n_d
    mxx = F.col("sxx").cast("double") / n_d
    # nullif: a group whose events all land in one hour bucket has zero
    # x-variance — both engines must agree on NULL, not Inf/NaN spellings.
    slope = (mxy - mx * my) / F.nullif(mxx - mx * mx, F.lit(0.0))
    return sums.select(
        "event_type",
        "n",
        F.round(slope * F.lit(24.0) / F.lit(100.0), 6).alias("slope_per_day"),
        F.round((my - slope * mx) / F.lit(100.0), 6).alias("intercept"),
    )


@query(
    "agg_bitmap_distinct",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE}
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via bitmap OR-aggregation — the
    ClickHouse/Doris "bitmap" pattern: pack each user_id into bit
    (id % 64) of slot (id / 64), ``bit_or`` the masks per
    (event_type, slot), then sum ``bit_count`` of the slot bitmaps.
    The result provably equals COUNT(DISTINCT) — the oracle IS plain
    COUNT(DISTINCT), no bitmap in sight.

    Why bother at scale: distinct-agg partials are per-key VALUE SETS
    (shuffle grows with distinct cardinality), while bitmap partials
    are fixed 8-byte words keyed by (group, slot) — the shuffle is
    bounded by the ID-SPACE/64 regardless of row count, the partials
    are mergeable by a single OR (hence reusable across rollup levels
    and incremental refreshes), and map-side combine compresses
    perfectly.  Dense surrogate IDs are the precondition (same one the
    production bitmap engines impose); sparse IDs go through a
    dictionary first."""
    ev = load_table(spark, sf_dir, "events")
    packed = ev.select(
        "event_type",
        F.expr("CAST(user_id / 64 AS BIGINT)").alias("slot"),
        F.expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(user_id % 64 AS INT))"
        ).alias("mask"),
    )
    slots = packed.groupBy("event_type", "slot").agg(
        F.bit_or("mask").alias("bits")
    )
    return slots.groupBy("event_type").agg(
        F.sum(F.bit_count("bits")).cast("long").alias("n_users")
    )


@query(
    "agg_bitmap_native",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE}
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type
    UNION ALL
    SELECT '<all>' AS event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    """,
)
def agg_bitmap_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via Spark's NATIVE bitmap function family
    (Spark 3.5+: ``bitmap_bucket_number`` / ``bitmap_bit_position`` /
    ``bitmap_construct_agg`` / ``bitmap_count`` / ``bitmap_or_agg``) —
    the built-in counterpart of ``agg_bitmap_distinct``'s hand-rolled
    64-bit words: ids bucket into fixed 4096-bit binary bitmaps, so the
    engine manages the word packing and the partials are opaque,
    OR-mergeable blobs.

    The '<all>' row is the point: per-bucket ``bitmap_or_agg`` MERGES
    the per-type bitmaps into a cross-type union whose bit count is the
    exact global distinct — the agg_sketch_partial rollup story
    (build once, re-aggregate coarser grains from stored partials)
    with NO approximation.  Oracle is plain COUNT(DISTINCT) at both
    grains: the bitmap math provably equals it.

    Scale: shuffle carries one ≤512-byte blob per (group, bucket) —
    bounded by id-space/4096, independent of row count; map-side
    combine collapses each partition's rows into those blobs first.
    Dense surrogate ids are the precondition, as with every bitmap
    engine (sparse ids go through a dictionary).

    The checkpointed blob table is UNPERSISTED before returning
    (ADVICE r10, same session-residency discipline as scan_cache):
    both grains are materialized through the checkpoint first, so the
    returned frame is the tiny final result and no re-scan happens at
    the driver's collect."""
    buckets, result = _agg_bitmap_native_grains(spark, sf_dir)
    rows = result.collect()  # both grains read the pinned blobs ONCE
    schema = result.schema
    # real release: localCheckpoint storage lives in persistentRdds,
    # which Dataset.unpersist never touches (ADVICE r11)
    release_local_checkpoint(buckets)
    return spark.createDataFrame(rows, schema)


def _agg_bitmap_native_grains(spark: SparkSession, sf_dir: str):
    """(checkpointed blob table, lazy two-grain union) — split out so the
    plan test can assert the build-once/re-aggregate shape (two
    ExistingRDD scans, zero parquet scans) before agg_bitmap_native
    materializes and unpersists it (the scan_cache pattern)."""
    ev = load_table(spark, sf_dir, "events")
    buckets = (
        ev.select(
            "event_type",
            F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
            F.expr("bitmap_bit_position(user_id)").alias("pos"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
        # both grains consume these blobs: pin the tiny partial table so
        # the fact scan runs ONCE (the operator's whole premise is
        # build-once/re-aggregate — a per-grain re-scan would refute it)
        .localCheckpoint(eager=False)
    )
    per_type = buckets.groupBy("event_type").agg(
        F.expr("CAST(SUM(bitmap_count(bm)) AS BIGINT)").alias("n_users")
    )
    merged = (
        buckets.groupBy("bucket")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
        .agg(
            F.lit("<all>").alias("event_type"),
            F.expr("CAST(SUM(bitmap_count(bm)) AS BIGINT)").alias("n_users"),
        )
    )
    return buckets, per_type.unionByName(merged)


@query(
    "agg_heavy_hitters",
    oracle="""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM toks),
    c AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM toks GROUP BY token
    )
    SELECT token, cnt,
           CAST(ROUND(cnt * 1000000.0 / n) AS BIGINT) / 1e6 AS share
    FROM c, tot WHERE cnt * 30 > n
    """,
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters (tokens with frequency > n/30) via the two-phase
    candidate-prune-then-recount pattern — the distributed spelling of
    Misra-Gries that stays EXACT: by pigeonhole, any token with global
    count > n/k must exceed n_p/k in at least one partition, so the
    per-partition threshold pass yields a guaranteed candidate
    SUPERSET; the exact recount + global threshold then makes the
    output invariant to partitioning (false candidates die), which is
    why a sketch-shaped plan can still be hash-checked against the
    plain exact oracle.

    Why not just groupBy(token): for a BOUNDED vocab (this fixture)
    the plain agg is fine — llm_zipf does it.  Heavy hitters earn
    their shape when the key domain is unbounded (user ids, URLs,
    IPs): the first phase ships one row per (partition, distinct-key)
    — completed map-side by partial aggregation since a partition's
    rows all share its pid — and the global agg then runs ONLY over
    keys surviving the per-partition threshold, so the wide shuffle
    carries candidates instead of the whole key domain.

    Plan: one scan → (pid, token) agg (map-side-complete by
    construction), localCheckpoint-pinned because totals, candidates,
    and the recount all fold from it; everything downstream is
    candidate-sized.  ``spark_partition_id`` appears only in phase-1
    grouping — the OUTPUT is partition-invariant by the superset
    argument above."""
    toks = load_table(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("token")
    )
    base = (
        toks.groupBy(
            F.spark_partition_id().alias("pid"), "token"
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    ptot = base.groupBy("pid").agg(F.sum("cnt").alias("np"))
    cand = (
        base.join(ptot, "pid")
        .filter(F.col("cnt") * 30 > F.col("np"))
        .select("token")
        .distinct()
    )
    tot = base.agg(F.sum("cnt").cast("long").alias("n"))
    exact = (
        base.join(F.broadcast(cand), "token", "left_semi")
        .groupBy("token")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(tot))
        .filter(F.col("cnt") * 30 > F.col("n"))
        .select(
            "token",
            "cnt",
            # tie-safe 6dp ratio: snap k*1e6/n to an integer first so any
            # rounding tie lands on a representable .5 (win_percentiles
            # lesson, r8 sf0.1 sweep)
            (
                F.round(F.col("cnt") * 1000000.0 / F.col("n")).cast("long")
                / 1e6
            ).alias("share"),
        )
    )


@query(
    "agg_listagg",
    oracle="""
    WITH seg AS (
      SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
      FROM customer GROUP BY 1, 2
    )
    SELECT c_nationkey,
           string_agg(c_mktsegment || ':' || CAST(n AS VARCHAR), ','
                      ORDER BY c_mktsegment) AS segments,
           CAST(COUNT(*) AS BIGINT) AS n_segments
    FROM seg GROUP BY c_nationkey
    """,
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG / string_agg) — per nation,
    the comma-joined 'segment:count' roster of market segments, sorted
    by segment name.

    Spark has no ordered string_agg aggregate; the portable spelling is
    ``array_join(array_sort(collect_list(...)))`` — collect_list's
    arrival order is nondeterministic BY CONTRACT (partial aggregation
    merges in task-completion order), so the array_sort is load-bearing:
    it is what turns a nondeterministic aggregate into a hash-checkable
    one (the events_cep fold uses the same trick).  Safe at scale only
    because the list is bounded: the inner (nation, segment) agg
    collapses to ≤ 25·5 rows before any list is built — never
    collect_list over raw fact rows."""
    cust = load_table(spark, sf_dir, "customer")
    seg = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n")
    )
    item = F.concat_ws(":", F.col("c_mktsegment"), F.col("n").cast("string"))
    return seg.groupBy("c_nationkey").agg(
        F.array_join(F.array_sort(F.collect_list(item)), ",").alias("segments"),
        F.count(F.lit(1)).alias("n_segments"),
    )


@query(
    "agg_weighted_median",
    oracle="""
    WITH li AS (
      SELECT l_returnflag, l_extendedprice AS price,
             CAST(l_quantity AS BIGINT) AS w
      FROM lineitem
    ),
    cum AS (
      SELECT l_returnflag, price, w,
             SUM(w) OVER (PARTITION BY l_returnflag ORDER BY price
                          ROWS UNBOUNDED PRECEDING) AS cw,
             SUM(w) OVER (PARTITION BY l_returnflag) AS tw
      FROM li
    )
    SELECT l_returnflag, MIN(price) AS w_median,
           CAST(MIN(tw) AS BIGINT) AS total_weight
    FROM cum WHERE 2 * cw >= tw GROUP BY l_returnflag
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted (lower) median: per return flag, the smallest extended
    price at which the running quantity-weight reaches half the total —
    the quantity-weighted typical price, robust where the mean is not.

    Spelling chosen for exactness and scale: weights cast to int64
    (l_quantity is integral by TPC-H construction) so the cumulative
    sum is exact integer arithmetic in both engines — no float
    accumulation order to disagree on — and the half-point test is the
    division-free ``2·cw ≥ tw``.  Price ties are harmless by
    construction: the qualifying set is a suffix of the price order, so
    MIN(price) lands on the crossing run's value no matter how either
    engine orders rows within the run.  One shuffle+sort on the group
    key serves both windows and the final agg; at 100 TB this is the
    standard exact-median discipline (sort within group), with
    approx_percentile as the documented sketch alternative when one
    pass must do."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    from pyspark.sql import Window as W

    cw = F.sum("w").over(
        W.partitionBy("l_returnflag")
        .orderBy("price")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    tw = F.sum("w").over(W.partitionBy("l_returnflag"))
    return (
        li.withColumn("cw", cw)
        .withColumn("tw", tw)
        .filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(
            F.min("price").alias("w_median"),
            F.min("tw").cast("long").alias("total_weight"),
        )
    )


@query(
    "agg_approx_percentile",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE}
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           TRUE AS q25_in_bracket,
           TRUE AS q50_in_bracket,
           TRUE AS q75_in_bracket
    FROM events GROUP BY event_type
    """,
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quartiles per event_type via Greenwald–Khanna
    (``approx_percentile``, accuracy=10_000 → rank error ≤ n/10⁴) next
    to the exact count — the 100 TB substitute for exact percentiles:
    GK partials are bounded-size mergeable summaries, so the shuffle
    carries sketches, not value lists (exact ``percentile`` ships every
    value through the aggregate).

    Envelope-oracle spelling (r10, VERDICT r9 item 1): the GK sketch's
    exact output value is engine-specific, so the query emits the GK
    guarantee itself as data — one boolean per quartile asserting the
    approximate value lands inside the exact [p−0.02, p+0.02] quantile
    bracket (rank error ≤ n/10⁴ guaranteed; the bracket gives ≥200×
    margin) — and the oracle asserts literal TRUE.  The exact
    ``percentile`` bracket is the VERIFICATION side only (it ships
    values; production reads just the GK column).

    Scalar columns, not an array: the driver's verifier canonicalizes
    by sorting every column, and array<double> is unsortable there
    (r8 driver run recorded 'unhashable type: numpy.ndarray')."""
    ev = load_table(spark, sf_dir, "events")
    q = F.expr("approx_percentile(value, array(0.25, 0.5, 0.75), 10000)")
    lo = F.expr("percentile(value, array(0.23, 0.48, 0.73))")
    hi = F.expr("percentile(value, array(0.27, 0.52, 0.77))")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        q.alias("_q"),
        lo.alias("_lo"),
        hi.alias("_hi"),
    )
    cols = ["event_type", "n_events"]
    out = g
    for i, name in enumerate(["q25_in_bracket", "q50_in_bracket", "q75_in_bracket"]):
        out = out.withColumn(
            name,
            (F.col("_lo")[i] <= F.col("_q")[i]) & (F.col("_q")[i] <= F.col("_hi")[i]),
        )
        cols.append(name)
    return out.select(*cols)


@query(
    "agg_corr",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE},
    pts AS (
      SELECT event_type,
             (epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01')) // 3600000000
               AS xh,
             CAST(ROUND(value * 100) AS BIGINT) AS yc
      FROM events
    ),
    sums AS (
      SELECT event_type, COUNT(*) AS n,
             SUM(xh) AS sx, SUM(yc) AS sy, SUM(xh * yc) AS sxy,
             SUM(xh * xh) AS sxx, SUM(yc * yc) AS syy
      FROM pts GROUP BY event_type
    )
    SELECT event_type, n,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / NULLIF(sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                          * sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 0.0),
                 6) AS corr_xy
    FROM sums
    """,
)
def agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Pearson correlation per event_type between spend and time
    (hour index × value cents) — the normalized companion of
    ``agg_linreg``'s slope, and the reason the built-in ``corr`` is
    rejected here: Spark's and DuckDB's corr both accumulate FLOAT
    co-moments in merge order, so their last ulps differ per run.

    Spelling: five exact int64 sums (the only fact-table pass), then
    r = (n·Σxy − ΣxΣy) / √(n·Σx²−(Σx)²)·√(n·Σy²−(Σy)²) with every
    numerator/denominator term an EXACT integer before one double
    cast — both engines round the same mathematical integer to the
    same double (exact below 2^53, correctly-rounded same value above),
    then run the identical IEEE sqrt/divide tree, 6dp-rounded.
    Zero-variance groups NULL via NULLIF.  One map-combined shuffle on
    the 5-value key; DuckDB's HUGEINT sum promotion is cast back at
    the term level (the ts_cusum lesson)."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        F.expr(
            "(unix_micros(ts) - unix_micros(TIMESTAMP '2024-01-01'))"
            " div 3600000000"
        ).alias("xh"),
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("yc"),
    )
    sums = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xh").alias("sx"),
        F.sum("yc").alias("sy"),
        F.sum(F.expr("xh * yc")).alias("sxy"),
        F.sum(F.expr("xh * xh")).alias("sxx"),
        F.sum(F.expr("yc * yc")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    denx = F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
    deny = F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
    return sums.select(
        "event_type",
        "n",
        F.round(num / F.nullif(denx * deny, F.lit(0.0)), 6).alias("corr_xy"),
    )


@query(
    "agg_argmax",
    oracle=f"""
    WITH {{events_cte}}
    , scored AS (
      SELECT event_type, event_id, user_id,
             CAST(ROUND(value * 100) AS BIGINT) * 1099511627776 + event_id
               AS score
      FROM events WHERE value IS NOT NULL
    )
    SELECT event_type,
           arg_max(event_id, score) AS top_event,
           arg_max(user_id, score) AS top_user,
           arg_min(event_id, score) AS bottom_event,
           CAST(MIN(event_id) AS BIGINT) AS first_event,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM scored GROUP BY event_type ORDER BY event_type
    """.format(events_cte=EVENTS_ORACLE_CTE),
)
def agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax aggregate surface (``max_by``/``min_by``, DuckDB
    ``arg_max``/``arg_min``): which event/user carried each type's
    highest spend — the "who was the max" lookup every leaderboard and
    attribution query needs without a self-join back to the fact table.

    Determinism discipline: max_by TIES are engine-arbitrary, so the
    ordering key is made UNIQUE before the aggregate — exact cents
    packed above the unique event_id (cents·2⁴⁰ + id; the packing is
    collision- and overflow-safe for cents < 2²³ and id < 2⁴⁰ — the
    sf0.1 fixture maxes out at 56 021 cents and the 10× probe's
    re-keyed ids stay under 2⁴⁰, both far inside those bounds).  ``any_value`` is deliberately NOT surfaced: it is
    nondeterministic by contract — the deterministic spelling is
    MIN/max_by, which ``first_event`` demonstrates.

    Plan: single map-combined hash aggregate — max_by partials carry
    one (value, key) pair per group per partition, the same O(groups)
    state as MIN/MAX (vs the window row_number + filter spelling,
    which shuffles every row to sort it)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    score = (
        F.round(F.col("value") * 100).cast("bigint") * F.lit(1099511627776)
        + F.col("event_id")
    )
    scored = ev.select("event_type", "event_id", "user_id", score.alias("score"))
    return (
        scored.groupBy("event_type")
        .agg(
            F.expr("max_by(event_id, score)").alias("top_event"),
            F.expr("max_by(user_id, score)").alias("top_user"),
            F.expr("min_by(event_id, score)").alias("bottom_event"),
            F.min("event_id").cast("long").alias("first_event"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .orderBy("event_type")
    )


@query(
    "agg_hll_union",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
           TRUE AS est_within_5pct
    FROM main.events GROUP BY event_type
    UNION ALL
    SELECT '<union>' AS event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
           TRUE AS est_within_5pct
    FROM main.events
    """,
)
def agg_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apache DataSketches HLL build + MERGE surface (``hll_sketch_agg``
    → ``hll_union_agg`` → ``hll_sketch_estimate``, Spark 3.5+): per
    event-type user sketches built in one pass, then UNIONED into a
    cross-type total — the property plain approx_count_distinct lacks
    (its HLL++ buffer is opaque; DataSketches sketches are a public
    wire format you can persist, ship between jobs, and merge later,
    which is how 100 TB rollup hierarchies avoid re-scanning facts:
    daily sketches merge into monthly into all-time).

    Envelope-oracle spelling (r10, VERDICT r9 item 1): sketch binaries
    and estimates are engine-specific, so each row emits the exact
    distinct count plus a boolean asserting the DataSketches estimate
    (per-type, and the merged union on the '<union>' row) lands within
    ±max(5%, 2) of it; the oracle computes the exact sides and literal
    TRUE.  Merge-consistency bounds (union ≤ sum of parts, ≥ max part)
    stay pinned in tests/test_aggregations.py.  The lgK=12 envelope is
    ~1.6% at 3σ — 5% is a safe deterministic margin, and fixture
    cardinalities sit in the exact sparse regime anyway."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.expr("hll_sketch_agg(user_id, 12)").alias("sk"),
        F.countDistinct("user_id").cast("long").alias("n_exact"),
    )
    merged = per_type.agg(
        F.lit("<union>").alias("event_type"),
        F.expr("CAST(hll_sketch_estimate(hll_union_agg(sk, true)) AS BIGINT)")
        .alias("n_est"),
        F.max(F.lit(None).cast("long")).alias("n_exact"),
    )
    global_exact = ev.agg(
        F.countDistinct("user_id").cast("long").alias("g_exact")
    )
    merged = merged.crossJoin(F.broadcast(global_exact)).select(
        "event_type",
        F.col("g_exact").alias("n_exact"),
        "n_est",
    )
    per = per_type.select(
        "event_type",
        "n_exact",
        F.expr("CAST(hll_sketch_estimate(sk) AS BIGINT)").alias("n_est"),
    )
    both = per.unionByName(merged)
    return both.select(
        "event_type",
        "n_exact",
        (
            F.abs(F.col("n_est") - F.col("n_exact"))
            <= F.greatest(F.col("n_exact") * 0.05, F.lit(2.0))
        ).alias("est_within_5pct"),
    ).orderBy("event_type")


# Count-Min sketch geometry: depth 4 independent hash rows, width 1024
# counters each — d·w = 4096 int64 counters (32 KiB) total, regardless
# of input size.
_CMS_D = 4
_CMS_W = 1024
# Portable bucket for depth i of key k: salted 60-bit md5 hash mod width
# (hashing.H_SPARK/H_DUCK evaluate identically on both engines).
_CMS_B_SPARK = (
    H_SPARK.format(x="concat('cms', CAST({i} AS STRING), ':', "
                     "CAST({k} AS STRING))") + f" % {_CMS_W}"
)
_CMS_B_DUCK = (
    H_DUCK.format(x="'cms' || CAST({i} AS VARCHAR) || ':' || "
                    "CAST({k} AS VARCHAR)") + f" % {_CMS_W}"
)


@query(
    "agg_count_min",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE},
    pairs AS (
      SELECT t.i, {_CMS_B_DUCK.format(i='t.i', k='user_id')} AS bucket
      FROM events, range({_CMS_D}) t(i)
    ),
    sk AS (SELECT i, bucket, COUNT(*) AS c FROM pairs GROUP BY 1, 2),
    keys AS (
      SELECT user_id, COUNT(*) AS true_count
      FROM events WHERE user_id % 11 = 0 GROUP BY 1
    ),
    probe AS (
      SELECT k.user_id, k.true_count, MIN(s.c) AS cms_estimate
      FROM keys k
      CROSS JOIN range({_CMS_D}) t(i)
      JOIN sk s
        ON s.i = t.i
       AND s.bucket = {_CMS_B_DUCK.format(i='t.i', k='k.user_id')}
      GROUP BY 1, 2
    )
    SELECT user_id, true_count, cms_estimate,
           cms_estimate - true_count AS overcount
    FROM probe
    """,
)
def agg_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) as a first-class
    distributed aggregate: d=4 salted-hash rows × w=1024
    counters give point-frequency estimates for an UNBOUNDED key domain
    in 32 KiB of state — the mergeable per-key-count summary you keep
    when groupBy(key) itself is the thing you can't afford (ad-hoc
    frequency probes over 100 TB of user ids / URLs / IPs).

    Build: each row contributes one increment per depth (posexplode of
    the d bucket exprs); map-side partial aggregation collapses
    every partition to ≤d·w rows before the ONLY data-sized shuffle, so
    the exchange carries sketch cells, not events.  Probe: the finished
    ≤d·w-row sketch is BROADCAST and each queried key takes the min of
    its d counters — per-probe cost independent of input size.  The
    audit probes every user_id ≡ 0 (mod 11) against its exact count:
    ``overcount`` ≥ 0 always (count-min never under-counts — the only
    inequality the structure guarantees deterministically) and the
    estimate itself is an exact function of (data, salts), so the whole
    table is hash-checked against the oracle's identical SQL-spelled
    sketch.  Spark's builtin ``count_min_sketch()`` emits an opaque
    binary blob this cross-engine oracle could never inspect — the
    open spelling costs one md5 per (row, depth) and stays exact.

    Unlike ``agg_heavy_hitters`` (exact top-k via candidate-prune, output
    = heavy keys only), the sketch answers ANY point query after one
    pass, at bounded state, with a quantified overcount."""
    ev = load_table(spark, sf_dir, "events").select("user_id")
    bucket_exprs = [
        F.expr(_CMS_B_SPARK.format(i=i, k="user_id")) for i in range(_CMS_D)
    ]
    sk = (
        ev.select(F.posexplode(F.array(*bucket_exprs)).alias("i", "bucket"))
        .groupBy("i", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    keys = (
        ev.filter(F.col("user_id") % 11 == 0)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("true_count"))
    )
    probes = keys.select(
        "user_id",
        "true_count",
        F.posexplode(
            F.array(
                *[
                    F.expr(_CMS_B_SPARK.format(i=i, k="user_id"))
                    for i in range(_CMS_D)
                ]
            )
        ).alias("i", "bucket"),
    )
    return (
        probes.join(F.broadcast(sk), ["i", "bucket"])
        .groupBy("user_id", "true_count")
        .agg(F.min("c").alias("cms_estimate"))
        .withColumn("overcount", F.col("cms_estimate") - F.col("true_count"))
    )
