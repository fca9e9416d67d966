"""Spark 4 language-surface keys: VARIANT, collations, SQL pipe syntax.

These are the three user-visible SQL-language additions of the Spark 4
line (semi-structured VARIANT values, per-expression string collations,
and the ``|>`` pipe-operator query syntax).  A user of any modern
analytics engine exercises all three daily, so each gets a first-class
registry key with an exact DuckDB oracle spelled against the same
parquet — the oracle never sees the new surface (DuckDB has none of the
three), it recomputes the RESULT from the raw columns, the source_xml
round-trip discipline: if the new code path changes anything, the hash
breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreaming_spark.io import EVENTS_ORACLE_CTE, load_table, spread
from kafkastreaming_spark.registry import query


@query(
    "fn_variant",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE}
    SELECT event_id,
           CAST(props->>'k' AS BIGINT) AS k_val,
           CAST(NULL AS VARCHAR) AS missing,
           CAST(1 AS INTEGER) AS miss_is_null,
           event_type AS et_rt,
           CAST(ROUND(value * 100) AS BIGINT) AS cents_rt,
           user_id AS uid_rt
    FROM events
    """,
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT surface (Spark 4 semi-structured type): ``parse_json``
    the props payload into a VARIANT, extract typed fields with
    ``variant_get``, probe an absent path with ``try_variant_get``
    (NULL, never an error), and round-trip three relational columns
    through ``to_json → parse_json → variant_get``.

    Oracle discipline: DuckDB has no VARIANT, so it recomputes every
    output from the RAW columns (``props->>'k'`` for the extraction,
    the original columns for the round trip) — the check pins that the
    VARIANT hop changed NOTHING, the source_xml pattern.  cents_rt
    proves the double survives JSON re-parsing bit-exactly (same IEEE
    value → same cents).

    Scale: all map-side expressions over one pushed-down scan — VARIANT
    parse/extract is JVM-native columnar work, the 100 TB path for
    schema-on-read telemetry lakes (parse once, bind paths lazily,
    no Python)."""
    ev = spread(load_table(spark, sf_dir, "events"), key="event_id")
    rt = F.parse_json(
        F.to_json(
            F.struct(
                F.col("event_type").alias("et"),
                F.col("value").alias("val"),
                F.col("user_id").alias("uid"),
            )
        )
    )
    return ev.select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias("k_val"),
        F.expr("try_variant_get(parse_json(props), '$.absent', 'string')").alias(
            "missing"
        ),
        F.expr(
            "CAST(try_variant_get(parse_json(props), '$.absent', 'string')"
            " IS NULL AS INT)"
        ).alias("miss_is_null"),
        rt.alias("_v"),
    ).select(
        "event_id",
        "k_val",
        "missing",
        "miss_is_null",
        F.expr("variant_get(_v, '$.et', 'string')").alias("et_rt"),
        F.expr(
            "CAST(ROUND(variant_get(_v, '$.val', 'double') * 100) AS BIGINT)"
        ).alias("cents_rt"),
        F.expr("variant_get(_v, '$.uid', 'bigint')").alias("uid_rt"),
    )


@query(
    "fn_collation",
    oracle="""
    WITH mixed AS (
      SELECT CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END AS m,
             lang
      FROM documents
    )
    SELECT lower(m) AS src_ci,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT m) AS BIGINT) AS n_case_variants,
           CAST(SUM(CASE WHEN lower(lang) = 'en' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_lang_en_ci
    FROM mixed
    GROUP BY 1
    ORDER BY 1
    """,
)
def fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation surface (Spark 4 per-expression collations): group,
    count-distinct, and filter under ``UTF8_LCASE`` over a
    deterministically case-mangled source column (even doc_ids
    upper-cased), next to the binary-collation distinct count inside
    each group.

    Determinism trap this key pins: the representative VALUE of a
    collated group key is whichever member the engine saw first — so
    the output never emits the raw key, only ``lower(key)`` (identical
    for every member of a UTF8_LCASE group, ASCII fixture).  DuckDB has
    no collation expressions, so the oracle is the lower()-twin.

    Scale: collated grouping is one hash shuffle on the normalized key,
    identical cost to binary grouping — the point of engine-level
    collations vs wrapping every predicate in lower() by hand (which
    defeats dictionary-encoded pushdown on the scan)."""
    docs = load_table(spark, sf_dir, "documents")
    mixed = docs.select(
        F.when(F.col("doc_id") % 2 == 0, F.upper("source"))
        .otherwise(F.col("source"))
        .alias("m"),
        "lang",
    )
    return (
        mixed.groupBy(F.collate("m", "UTF8_LCASE").alias("g"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct(F.collate("m", "UTF8_BINARY"))
            .cast("long")
            .alias("n_case_variants"),
            F.sum(
                (F.collate("lang", "UTF8_LCASE") == F.lit("EN")).cast("int")
            )
            .cast("long")
            .alias("n_lang_en_ci"),
        )
        .select(
            F.lower("g").alias("src_ci"),
            "n_docs",
            "n_case_variants",
            "n_lang_en_ci",
        )
        .orderBy("src_ci")
    )


@query(
    "sql_pipe",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE}
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    WHERE value > 50
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def sql_pipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4 ``|>`` operator, SPARK-49555): the same
    filtered per-type rollup every dashboard runs, written as a linear
    pipeline — FROM → |> WHERE → |> AGGREGATE ... GROUP BY →
    |> ORDER BY — instead of the inside-out ANSI nesting.  The oracle
    is the ANSI spelling, so the hash pins that pipe syntax is pure
    sugar over the identical logical plan (Catalyst parses both to the
    same Aggregate node; predicate still reaches the scan).

    Cents sum is exact int64 per the §5.4 discipline."""
    ev = load_table(spark, sf_dir, "events")
    view = "events_pipe_v"
    ev.createOrReplaceTempView(view)
    return spark.sql(
        f"""
        FROM {view}
        |> WHERE value > 50
        |> AGGREGATE COUNT(*) AS n_events,
                     CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents,
                     COUNT(DISTINCT user_id) AS n_users
           GROUP BY event_type
        |> SELECT event_type, n_events, cents, n_users
        |> ORDER BY event_type
        """
    )


@query(
    "sql_recursive",
    oracle="""
    WITH RECURSIVE anc AS (
      SELECT c_custkey AS k, c_custkey AS node, 0 AS depth
      FROM customer
      UNION ALL
      SELECT k, node // 10, depth + 1 FROM anc WHERE node > 0
    )
    SELECT depth,
           CAST(COUNT(*) AS BIGINT) AS n_chains,
           CAST(COUNT(DISTINCT node) AS BIGINT) AS n_nodes,
           bit_xor(k * 1048576 + node) AS chain_xor
    FROM anc
    GROUP BY depth
    ORDER BY depth
    """,
)
def sql_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native recursive CTE (Spark 4 ``WITH RECURSIVE``, SPARK-24497):
    walk every customer's ancestor chain up a deterministic 10-ary
    hierarchy (parent = key DIV 10, root 0) and roll up per-depth chain
    counts, distinct-node counts, and an exact xor fold over the
    (customer, ancestor) pairs.

    DuckDB runs the IDENTICAL recursive SQL, so this key pins Spark's
    recursion semantics (UNION ALL step, termination predicate, working
    table scoping) value-for-value against an independent
    implementation — complementary to graph_bfs, whose Spark side is a
    driver-paced iterative loop; here the ENGINE owns the fixpoint.

    Scale: each iteration is one shuffle-free projection+filter over
    the frontier (depth ≤ 1+log10(maxkey), so the fixpoint closes in
    ~6 steps regardless of row count); the single real shuffle is the
    final per-depth aggregate.  Truncating vs flooring division never
    diverges — keys are nonnegative."""
    cust = load_table(spark, sf_dir, "customer")
    view = "customer_rec_v"
    cust.createOrReplaceTempView(view)
    return spark.sql(
        f"""
        WITH RECURSIVE anc AS (
          SELECT c_custkey AS k, c_custkey AS node, 0 AS depth
          FROM {view}
          UNION ALL
          SELECT k, node DIV 10, depth + 1 FROM anc WHERE node > 0
        )
        SELECT depth,
               CAST(COUNT(*) AS BIGINT) AS n_chains,
               CAST(COUNT(DISTINCT node) AS BIGINT) AS n_nodes,
               bit_xor(k * 1048576 + node) AS chain_xor
        FROM anc
        GROUP BY depth
        ORDER BY depth
        """
    )


@query(
    "sql_params",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE}
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events
    WHERE value >= 25.0 AND event_type IN ('click', 'purchase')
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def sql_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (Spark 4 named-parameter binding,
    ``spark.sql(query, args={...})``): the dashboard rollup with its
    threshold and type-list bound as PARAMETERS, not string-spliced
    literals — the SQL-injection-safe templating surface every
    multi-tenant query service needs (parameters bind as typed
    literals AFTER parsing; a malicious string can never re-shape the
    plan).

    The oracle inlines the same constants, pinning that binding is
    value-transparent.  Catalyst constant-folds bound parameters
    exactly like literals, so the filter still reaches the scan."""
    ev = load_table(spark, sf_dir, "events")
    view = "events_param_v"
    ev.createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM {view}
        WHERE value >= :threshold AND event_type IN (:t1, :t2)
        GROUP BY event_type
        ORDER BY event_type
        """,
        args={"threshold": 25.0, "t1": "click", "t2": "purchase"},
    )


@query(
    "fn_mask",
    oracle="""
    SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(
             c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'),
             '[0-9]', 'n', 'g') AS masked_default,
           regexp_replace(c_name, '[0-9]', '#', 'g') AS digits_only,
           regexp_replace(regexp_replace(
             c_mktsegment, '[A-Z]', 'U', 'g'), '[a-z]', 'l', 'g')
             AS seg_masked
    FROM customer
    """,
)
def fn_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-masking surface (Spark 4 ``mask()``) — the column-level
    governance primitive for PII display paths: default masking
    (upper→X, lower→x, digit→n, others kept), digit-only masking via
    the NULL-means-keep per-class arguments, and custom replacement
    chars.  Complements llm_pii_redact (which FINDS entities by
    pattern; mask() blanket-redacts by character class — the
    belt-and-suspenders pair every governance pipeline layers).

    DuckDB has no mask(), so the oracle is the regexp_replace chain
    the function is sugar for — the hash pins the exact character-class
    semantics (non-ASCII and punctuation pass through untouched).

    Map-only codegen projection — scan speed at any scale."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.expr("mask(c_name)").alias("masked_default"),
        F.expr("mask(c_name, NULL, NULL, '#', NULL)").alias("digits_only"),
        F.expr("mask(c_mktsegment, 'U', 'l')").alias("seg_masked"),
    )


@query(
    "fn_xpath",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS y,
           o_orderpriority AS pri,
           CAST(ROUND(o_totalprice, 2) AS VARCHAR) AS price_str,
           CAST(2 AS INTEGER) AS n_tags
    FROM orders WHERE o_orderkey % 29 = 0
    """,
)
def fn_xpath(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XPath function surface (``xpath_long`` / ``xpath_string`` /
    ``xpath``): each order is rendered into an XML fragment and the
    values extracted BACK by path expression — the legacy-integration
    surface for XML payloads embedded in columns (SOAP bodies, config
    blobs), distinct from source_xml's whole-file data source.

    Round-trip discipline (source_xml's): the oracle recomputes every
    output from the RAW columns, so XML serialization + XPath
    extraction must be lossless — including the money column, which
    routes through ROUND(…, 2) BEFORE serialization on both sides (the
    fn_format %.2f rule: never print an unrounded double).

    Deliberately BOUNDED to a 1/29 slice (r12; was 1/11): each xpath_*
    call DOM-parses the fragment per row (~180 µs/row measured — 27 s
    for the full sf0.1 table), which is exactly why bulk XML extraction goes
    through the native source_xml reader (streaming SAX, schema
    projection) and per-row XPath is reserved for small embedded
    fragments.  The slice pins the function surface; the cost note
    pins the usage contract."""
    o = spread(
        load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderkey") % 29 == 0
        ),
        key="o_orderkey",
    )
    xml = F.concat(
        F.lit("<o><y>"),
        F.year("o_orderdate").cast("string"),
        F.lit("</y><pri>"),
        F.col("o_orderpriority"),
        F.lit("</pri><p>"),
        F.round("o_totalprice", 2).cast("string"),
        F.lit("</p><t/><t/></o>"),
    )
    return o.select(
        "o_orderkey",
        xml.alias("_xml"),
    ).select(
        "o_orderkey",
        F.expr("xpath_long(_xml, '/o/y')").alias("y"),
        F.expr("xpath_string(_xml, '/o/pri')").alias("pri"),
        F.expr("xpath_string(_xml, '/o/p')").alias("price_str"),
        F.expr("size(xpath(_xml, '/o/t'))").alias("n_tags"),
    )


@query(
    "sql_script",
    oracle="""
    WITH cents AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c FROM orders
    ),
    t AS (SELECT CAST((SELECT COUNT(*) FROM cents WHERE c > 0) // 150
                      AS BIGINT) AS target),
    probes AS (
      SELECT r.k,
             (SELECT COUNT(*) FROM cents
              WHERE c > r.k * 5000000) AS n_above
      FROM range(0, 17) r(k)
    ),
    best AS (
      SELECT p.k, p.n_above, t.target
      FROM probes p, t
      WHERE p.n_above <= t.target
      ORDER BY p.k LIMIT 1
    )
    SELECT CAST(k * 50000 AS BIGINT) AS threshold,
           CAST(n_above AS BIGINT) AS n_above,
           target
    FROM best
    """,
)
def sql_script(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (Spark 4.0, SQL/PSM-style): BEGIN…END with DECLAREd
    session variables — including a MAP-typed one — scalar-subquery
    SETs, a data-driven WHILE bisection loop with nested IF/ELSE, and
    EXECUTE IMMEDIATE (dynamic SQL with typed USING binds) emitting the
    result: the stored-procedure-shaped surface that replaces
    driver-side Python glue for migration scripts and runbooks.

    The script is a monotone threshold search — the smallest 50k-step
    price threshold leaving at most ``count(price > 0) DIV 150`` orders
    above it — shaped by the surface's measured cost model (r12): every
    scripting statement pays driver-side parse/plan, ~0.45 s when the
    statement embeds a scalar SUBQUERY vs ~0.07 s for pure variable
    arithmetic.  So the data crosses into script state exactly ONCE:
    one cluster job folds orders to ≤17 exact suffix counts on the
    money-cents grid (``count(price > k·50k)`` = Σ_{b≥k} cnt_b − e_k
    with exact-boundary hits e_k, so strict inequality is
    integer-exact), collect()ed into a LocalRelation (bounded metadata)
    and loaded into a ``MAP<BIGINT,BIGINT>`` session variable by the
    script's single subquery SET; every loop probe is then
    ``element_at`` on that variable — arithmetic-priced, no per-probe
    plan.  The WHILE bisects [0, 16] under the invariant lo fails / hi
    satisfies.  The oracle spells the closed form (min k over the step
    grid): when a loop's fixed point is expressible declaratively, that
    single query is what production should run — this key pins that the
    scripting surface reaches the identical exact answer and documents
    the rewrite.

    Surfaces pinned: DECLARE (scalar and MAP-typed) / DEFAULT,
    SET var = (scalar subquery), map_from_entries/element_at on a
    session variable, WHILE…DO…END WHILE, IF…THEN…ELSE…END IF nested in
    the loop, EXECUTE IMMEDIATE … USING (typed binds, not string
    splicing — same injection-safety contract as sql_params)."""
    o = load_table(spark, sf_dir, "orders")
    hist = (
        o.select(
            F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("c")
        )
        .groupBy(F.expr("c DIV 5000000").alias("b"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(
                F.expr("CASE WHEN c % 5000000 = 0 THEN 1 ELSE 0 END")
            ).alias("e"),
        )
    )
    # suffix[k] = exact count(cents > k*5_000_000), k = 0..16
    rows = {int(r["b"]): (int(r["cnt"]), int(r["e"])) for r in hist.collect()}
    suffix = []
    for k in range(17):
        n_above = sum(c for b, (c, _) in rows.items() if b >= k)
        n_above -= rows.get(k, (0, 0))[1]
        suffix.append((k, n_above))
    # Bisection invariant guard (ADVICE r12): the loop assumes some k in
    # [0, 16] satisfies n_above <= target, i.e. suffix[16] <= target.
    # target = suffix[0] DIV 150 makes this equivalent to "< 1/150 of
    # positive-price orders exceed 16·50k = 800k cents·100"; TPC-H
    # o_totalprice tops out well below that, so suffix[16] is 0 at every
    # fixture SF.  If a future fixture broke the bound the script would
    # emit hi=16 with n > target while the oracle's WHERE…LIMIT 1
    # returns zero rows — fail loudly here instead of hash-mismatching.
    if suffix[16][1] > suffix[0][1] // 150:
        raise ValueError(
            "sql_script bisection unsatisfiable: "
            f"suffix[16]={suffix[16][1]} > target={suffix[0][1] // 150}"
        )
    local = spark.createDataFrame(suffix, "k long, n_above long")
    view = "orders_script_suffix_v"
    local.createOrReplaceTempView(view)
    return spark.sql(
        f"""
        BEGIN
          DECLARE suffix MAP<BIGINT, BIGINT>;
          DECLARE target BIGINT;
          DECLARE lo BIGINT DEFAULT 0;
          DECLARE hi BIGINT DEFAULT 16;
          DECLARE mid BIGINT;
          DECLARE n BIGINT;
          SET suffix = (SELECT map_from_entries(collect_list(struct(k, n_above)))
                        FROM {view});
          SET target = element_at(suffix, 0L) DIV 150;
          SET n = element_at(suffix, 0L);
          IF n <= target THEN
            SET hi = 0;
          ELSE
            WHILE hi - lo > 1 DO
              SET mid = (lo + hi) DIV 2;
              SET n = element_at(suffix, mid);
              IF n <= target THEN SET hi = mid; ELSE SET lo = mid; END IF;
            END WHILE;
            SET n = element_at(suffix, hi);
          END IF;
          EXECUTE IMMEDIATE
            'SELECT CAST(? AS BIGINT) AS threshold,
                    CAST(? AS BIGINT) AS n_above,
                    CAST(? AS BIGINT) AS target'
            USING hi * 50000, n, target;
        END
        """
    )
