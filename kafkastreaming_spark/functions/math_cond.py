"""Math, conditional, and cast bundles (SURVEY.md §2.8 fn_math/fn_cond/fn_cast).

Transcendentals (sqrt/ln/exp/power) can differ by 1 ULP between JVM and
libm, so they are rounded to 6dp AND computed over a filtered subset
(1 in 20 rows) to keep the tie-boundary probability negligible
(SURVEY.md §5.4).  ``round(x, 2)`` targets quotient values (never exact
2dp inputs) because Spark rounds via decimal string and DuckDB via
multiply — they disagree on exact decimal ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreaming_spark.io import EVENTS_ORACLE_CTE, load_table
from kafkastreaming_spark.registry import query


@query(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS abs_disc_delta,
           round(l_extendedprice / 7, 2) AS price_seventh,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
           round(power(l_quantity, 2), 6) AS qty_sq,
           round(sqrt(l_extendedprice), 6) AS price_sqrt,
           round(ln(l_extendedprice), 6) AS price_ln,
           round(exp(l_discount), 6) AS disc_exp,
           l_orderkey % 7 AS key_mod,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
           greatest(l_quantity, l_discount * 100) AS biggest,
           least(l_quantity, l_discount * 100) AS smallest
    FROM lineitem
    WHERE l_orderkey % 20 = 0
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """abs/round/floor/ceil/power/sqrt/ln/exp/mod/sign/greatest/least."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 20 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_disc_delta"),
        F.round(F.col("l_extendedprice") / 7, 2).alias("price_seventh"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.round(F.pow("l_quantity", F.lit(2)), 6).alias("qty_sq"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        F.greatest(F.col("l_quantity"), F.col("l_discount") * 100).alias("biggest"),
        F.least(F.col("l_quantity"), F.col("l_discount") * 100).alias("smallest"),
    )


@query(
    "fn_cond",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 400000 THEN 'jumbo'
                WHEN o_totalprice >= 150000 THEN 'large'
                WHEN o_totalprice >= 50000  THEN 'medium'
                ELSE 'small' END AS size_tier,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_label,
           nullif(o_orderpriority, '4-NOT SPECIFIED') AS priority_or_null,
           CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END
             AS finished_value,
           if(o_custkey % 2 = 0, 'even', 'odd') AS key_parity
    FROM orders
    """,
)
def fn_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif / if."""
    o = load_table(spark, sf_dir, "orders")
    tier = (
        F.when(F.col("o_totalprice") >= 400000, "jumbo")
        .when(F.col("o_totalprice") >= 150000, "large")
        .when(F.col("o_totalprice") >= 50000, "medium")
        .otherwise("small")
    )
    return o.select(
        "o_orderkey",
        tier.alias("size_tier"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("P")), F.lit("PENDING")).alias(
            "status_label"
        ),
        F.nullif("o_orderpriority", F.lit("4-NOT SPECIFIED")).alias("priority_or_null"),
        F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))
        .otherwise(F.lit(0.0))
        .alias("finished_value"),
        F.when(F.col("o_custkey") % 2 == 0, "even").otherwise("odd").alias("key_parity"),
    )


@query(
    "fn_cast",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE}
    SELECT event_id,
           CAST(trunc(value) AS INTEGER) AS value_int,
           CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS value_str,
           CAST(user_id AS VARCHAR) AS user_str,
           TRY_CAST(event_type AS DOUBLE) AS bad_double,
           CASE WHEN regexp_matches(props, '^[+-]?[0-9]{{1,18}}$')
                THEN CAST(props AS BIGINT) END AS bad_long,
           TRY_CAST(CAST(user_id AS VARCHAR) AS INTEGER) AS roundtrip_int,
           CAST(value > 100 AS INTEGER) AS is_big,
           CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day_ts
    FROM events
    """,
)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast matrix incl. try_cast of malformed strings → NULL.

    double→int truncates toward zero in Spark but ROUNDS in DuckDB — the
    oracle uses trunc() to pin Spark's semantics.  double→string goes
    through DECIMAL(18,2) so both engines print the identical '123.45'.

    Scale note on ``bad_long``: Spark's try_cast string→bigint pays a
    caught JVM exception on every FAILING row — measured 14 µs/row
    (1.4 s of this key's 1.6 s at sf0.1, where every props value is
    JSON and fails).  On a mostly-malformed column at 100 TB that
    exception storm dominates the scan, so the Spark spelling guards
    with a branch instead: RLIKE integer-shape (≤18 digits, so the
    inner cast can never overflow-throw) THEN cast ELSE NULL.  That
    grammar is deliberately NARROWER than TRY_CAST (TRY_CAST also
    accepts whitespace-padded '  42' and decimal '1.5'), so the oracle
    pins the IDENTICAL regex-shaped CASE rather than TRY_CAST — both
    engines accept exactly the same strings by construction.
    ``bad_double`` keeps the genuine try_cast surface on both sides
    (its failure path is ~3× cheaper)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.col("value").cast("int").alias("value_int"),
        F.col("value").cast("decimal(18,2)").cast("string").alias("value_str"),
        F.col("user_id").cast("string").alias("user_str"),
        F.col("event_type").try_cast("double").alias("bad_double"),
        F.when(
            F.col("props").rlike(r"^[+-]?[0-9]{1,18}$"),
            F.col("props").cast("bigint"),
        ).alias("bad_long"),
        F.col("user_id").cast("string").try_cast("int").alias("roundtrip_int"),
        (F.col("value") > 100).cast("int").alias("is_big"),
        F.col("ts").cast("date").cast("timestamp").alias("day_ts"),
    )


@query(
    "fn_bitwise",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE}
    SELECT event_id,
           event_id & user_id AS b_and,
           event_id | user_id AS b_or,
           xor(event_id, user_id) AS b_xor,
           CAST(event_id << 3 AS BIGINT) AS b_shl,
           event_id >> 2 AS b_shr,
           CAST(bit_count(event_id) AS INTEGER) AS b_pop,
           CASE WHEN value IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END AS v_is_null,
           CASE WHEN event_type IS DISTINCT FROM 'click' THEN 1 ELSE 0 END AS not_click
    FROM events
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise ops + null-safe comparison bundle — exact integer math, no
    determinism discipline needed (DuckDB spells xor as a function and
    null-safe equality as IS [NOT] DISTINCT FROM vs Spark's ^ and <=>)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.expr("event_id & user_id").alias("b_and"),
        F.expr("event_id | user_id").alias("b_or"),
        F.expr("event_id ^ user_id").alias("b_xor"),
        F.expr("shiftleft(event_id, 3)").alias("b_shl"),
        F.expr("shiftright(event_id, 2)").alias("b_shr"),
        F.expr("bit_count(event_id)").alias("b_pop"),
        F.expr("CAST(value <=> NULL AS INT)").alias("v_is_null"),
        F.expr("CAST(NOT (event_type <=> 'click') AS INT)").alias("not_click"),
    )


@query(
    "fn_null",
    oracle="""
    WITH base AS (
      SELECT c_custkey,
             NULLIF(c_mktsegment, 'BUILDING') AS seg_or_null,
             NULLIF(c_acctbal, 0.0) AS bal_or_null
      FROM customer
    )
    SELECT COUNT(*) AS n_rows,
           COUNT(seg_or_null) AS n_seg_not_null,
           CAST(SUM(CASE WHEN seg_or_null IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_seg_null,
           CAST(SUM(CASE WHEN seg_or_null IS NOT DISTINCT FROM NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_null_safe_eq,
           COUNT(DISTINCT seg_or_null) AS n_distinct_seg,
           CAST(ROUND(SUM(CAST(COALESCE(bal_or_null, 0.0) AS DECIMAL(24,8))),
                      2) AS DOUBLE) AS total_bal
    FROM base
    """,
)
def fn_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-semantics bundle: NULLIF to synthesize NULLs from real data
    (the fixture tables ship none), then the behaviors every engine must
    pin — COUNT(*) vs COUNT(col), predicate-based null counting,
    null-safe equality (Spark `<=>` ≡ SQL IS NOT DISTINCT FROM),
    COUNT(DISTINCT) ignoring NULLs, and COALESCE feeding an aggregate.
    All integer counts plus one decimal-disciplined sum — exactly
    hash-checkable."""
    cust = load_table(spark, sf_dir, "customer")
    base = cust.select(
        "c_custkey",
        F.expr("NULLIF(c_mktsegment, 'BUILDING')").alias("seg_or_null"),
        F.expr("NULLIF(c_acctbal, 0.0D)").alias("bal_or_null"),
    )
    return base.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("seg_or_null").alias("n_seg_not_null"),
        F.sum(F.when(F.col("seg_or_null").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_seg_null"),
        F.sum(F.when(F.expr("seg_or_null <=> NULL"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_null_safe_eq"),
        F.countDistinct("seg_or_null").alias("n_distinct_seg"),
        F.round(
            F.sum(F.coalesce("bal_or_null", F.lit(0.0)).cast("decimal(24,8)")), 2
        )
        .cast("double")
        .alias("total_bal"),
    )


@query(
    "fn_try",
    oracle="""
    WITH h AS (
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
             l_returnflag, l_linestatus, l_shipdate,
             CAST(l_orderkey AS HUGEINT) * 60000000000000 AS mul_h,
             CAST(l_orderkey AS HUGEINT)
               + CASE WHEN l_orderkey % 970 = 0
                      THEN 9223372036854775000
                      ELSE CAST(l_linenumber AS HUGEINT) END AS add_h,
             CASE WHEN l_orderkey % 970 = 0
                  THEN -9223372036854775000
                  ELSE -CAST(l_linenumber AS HUGEINT) END
               - CAST(l_orderkey AS HUGEINT) AS sub_h
      FROM lineitem WHERE l_orderkey % 10 = 0
    )
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity = 30 THEN NULL
                ELSE l_extendedprice / (l_quantity - 30) END AS div_qty30,
           CASE WHEN l_linenumber = 4 THEN NULL
                ELSE CAST(l_orderkey AS DOUBLE) / (l_linenumber - 4)
                END AS div_line4,
           CASE WHEN l_linenumber = 4 THEN NULL
                ELSE l_orderkey % (l_linenumber - 4) END AS mod_line4,
           CAST(CASE WHEN mul_h > 9223372036854775807 THEN NULL
                     ELSE mul_h END AS BIGINT) AS mul_guard,
           CAST(CASE WHEN add_h > 9223372036854775807 THEN NULL
                     ELSE add_h END AS BIGINT) AS add_guard,
           CAST(CASE WHEN sub_h < -9223372036854775808 THEN NULL
                     ELSE sub_h END AS BIGINT) AS sub_guard,
           string_split(l_returnflag || ' ' || l_linestatus, ' ')[l_linenumber]
             AS elem_at,
           TRY_CAST(l_linestatus AS BIGINT) AS num_bad,
           CAST(l_orderkey AS BIGINT) AS num_good,
           CAST(CAST(l_shipdate AS DATE) AS TIMESTAMP) AS ts_good,
           TRY_CAST(l_returnflag AS TIMESTAMP) AS ts_bad
    FROM h
    """,
)
def fn_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe ``try_*`` expression family (Spark 3.5/4 surface):
    ``try_add / try_subtract / try_multiply`` (NULL on int64 overflow
    instead of a wrapped value or an ANSI throw), ``try_divide /
    try_mod`` (NULL on zero divisor), ``try_element_at`` (NULL past the
    array end), ``try_to_number`` (NULL on non-numeric text), and
    ``try_to_timestamp`` (NULL on unparseable text) — the spellings
    that make a 100 TB ingest job land NULLs in a quarantine column
    instead of dying 6 hours in on one malformed row.

    Overflow thresholds are chosen so BOTH branches are exercised by
    real rows at every SF, AND so the overflow branch stays RARE: the
    JVM's try_add/try_subtract failure path is a caught
    ArithmeticException measured at ~26 µs/overflowing row (r12 — the
    same exception-storm trap fn_cast documents for try_cast), so the
    near-rail add/sub operand is confined to the l_orderkey ≡ 0
    (mod 970) stratum (~1 % of rows; key 970 overflows at even the
    smallest SF) while every other row adds/subtracts a small operand
    on the normal path.  try_multiply's overflow check is branch-based
    in the JVM (no exception, measured free), so its threshold
    (orderkey·6e13 overflows above key 153,740) can stay
    magnitude-split.  The DuckDB oracle promotes to HUGEINT and guards
    with the exact int64 rails — DuckDB's own BIGINT arithmetic THROWS
    on overflow (no silent wrap to imitate), so the guarded-HUGEINT
    spelling is the only cross-engine-exact oracle.  Division/
    mod-by-zero guards are plain CASE (DuckDB double division yields
    Inf, integer % 0 throws).  All other columns are engine-native try
    casts/parses on both sides."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 10 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide("l_extendedprice", F.col("l_quantity") - 30).alias("div_qty30"),
        F.try_divide("l_orderkey", F.col("l_linenumber") - 4).alias("div_line4"),
        F.try_mod("l_orderkey", F.col("l_linenumber") - 4).alias("mod_line4"),
        F.try_multiply("l_orderkey", F.lit(60000000000000)).alias("mul_guard"),
        F.try_add(
            "l_orderkey",
            F.when(F.col("l_orderkey") % 970 == 0, F.lit(9223372036854775000))
            .otherwise(F.col("l_linenumber").cast("bigint")),
        ).alias("add_guard"),
        F.try_subtract(
            F.when(
                F.col("l_orderkey") % 970 == 0, F.lit(-9223372036854775000)
            ).otherwise(-F.col("l_linenumber").cast("bigint")),
            F.col("l_orderkey"),
        ).alias("sub_guard"),
        F.try_element_at(
            F.split(F.concat_ws(" ", "l_returnflag", "l_linestatus"), " "),
            F.col("l_linenumber"),
        ).alias("elem_at"),
        F.try_to_number("l_linestatus", F.lit("999")).cast("long").alias("num_bad"),
        F.try_to_number(F.col("l_orderkey").cast("string"), F.lit("999999999999"))
        .cast("long")
        .alias("num_good"),
        F.try_to_timestamp(
            F.date_format("l_shipdate", "yyyy-MM-dd"), F.lit("yyyy-MM-dd")
        ).alias("ts_good"),
        F.try_to_timestamp("l_returnflag").alias("ts_bad"),
    )
