"""String function bundle (SURVEY.md §2.8 fn_string).

All built-in ``pyspark.sql.functions`` — JVM-side, codegen'd, no Python
boundary.  The oracle maps each to its DuckDB spelling 1:1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreaming_spark.io import load_table, spread
from kafkastreaming_spark.registry import query


@query(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           lower(c_mktsegment) AS seg_lower,
           trim(lpad(c_name, 25, ' ')) AS name_trimmed,
           substring(c_name, 10, 9) AS name_digits,
           c_name || '/' || c_mktsegment AS name_seg,
           CAST(length(c_name) AS INTEGER) AS name_len,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
           replace(c_name, 'Customer', 'Cust') AS name_replaced,
           CAST(length(string_split(c_name, '0')) AS INTEGER) AS n_zero_splits,
           regexp_extract(c_name, '([1-9][0-9]*)$', 1) AS key_digits,
           regexp_replace(c_name, '0+', '0', 'g') AS name_squeezed,
           CAST(levenshtein(c_mktsegment, 'MACHINERY') AS INTEGER) AS seg_lev,
           c_name LIKE 'Customer#%9' AS ends_in_9
    FROM customer
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/trim/substring/concat/length/lpad/replace/split/regexp/
    levenshtein/like over customer."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.trim(F.lpad("c_name", 25, " ")).alias("name_trimmed"),
        F.substring("c_name", 10, 9).alias("name_digits"),
        F.concat_ws("/", "c_name", "c_mktsegment").alias("name_seg"),
        F.length("c_name").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_replaced"),
        F.size(F.split("c_name", "0")).alias("n_zero_splits"),
        F.regexp_extract("c_name", r"([1-9][0-9]*)$", 1).alias("key_digits"),
        F.regexp_replace("c_name", "0+", "0").alias("name_squeezed"),
        F.levenshtein("c_mktsegment", F.lit("MACHINERY")).alias("seg_lev"),
        F.col("c_name").like("Customer#%9").alias("ends_in_9"),
    )


@query(
    "fn_levenshtein",
    oracle="""
    WITH probe AS (
      SELECT c_custkey AS probe_key, c_name AS probe_name
      FROM customer WHERE c_custkey < 20
    )
    SELECT probe_key,
           c.c_custkey AS match_key,
           CAST(levenshtein(probe_name, c.c_name) AS BIGINT) AS edit_dist
    FROM probe, customer c
    WHERE c.c_custkey <> probe_key
      AND levenshtein(probe_name, c.c_name) <= 2
    """,
)
def fn_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy match: for a 20-row probe set, every OTHER
    customer whose name is within levenshtein ≤ 2 — entity-resolution's
    workhorse primitive (typo-tolerant key matching).

    The probe side is broadcast, bounding the scan at |probes| × n with
    one corpus pass — the same query-vs-corpus shape as
    llm_topk_similar/llm_ngram_jaccard.  An UNBOUNDED fuzzy self-join
    would instead go through candidate generation first (length bands +
    shared-gram candidates, as in the dedup family); edit distance is
    only ever computed on candidate pairs at scale."""
    cust = spread(
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_name"),
        key="c_custkey",
    )
    probe = cust.filter(F.col("c_custkey") < 20).select(
        F.col("c_custkey").alias("probe_key"), F.col("c_name").alias("probe_name")
    )
    return (
        F.broadcast(probe)
        .join(cust, F.col("c_custkey") != F.col("probe_key"))
        .withColumn(
            "edit_dist",
            F.levenshtein(F.col("probe_name"), F.col("c_name")).cast("bigint"),
        )
        .filter(F.col("edit_dist") <= 2)
        .select("probe_key", F.col("c_custkey").alias("match_key"), "edit_dist")
    )


@query(
    "fn_regexp",
    oracle=r"""
    SELECT doc_id,
           regexp_matches(text, 'table') AS has_table,
           CAST(len(regexp_extract_all(text, '[a-z]+e')) AS BIGINT)
             AS n_e_words,
           regexp_extract(text, '([a-z]+) ([a-z]+)', 2) AS second_word,
           regexp_replace(text, '[aeiou]', '_', 'g') AS devoweled,
           CAST(len(string_split_regex(text, '\s+')) AS BIGINT)
             AS n_ws_tokens,
           regexp_extract_all(text, '[a-z]{5,}')[1] AS first_long_word
    FROM documents
    """,
)
def fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex surface battery: rlike / extract (group 2) / extract_all
    (+ count via size) / global replace / regex split / first-match
    with NULL-on-no-match — the ETL-sanitization toolkit over the
    documents corpus.

    Dialect discipline: every pattern here ([a-z]+e, [aeiou], \\s+,
    [a-z]{5,}) means the same thing to Java regex (Spark) and RE2
    (DuckDB) — no backreferences, lookaround, or lazy quantifiers,
    which is exactly the portable subset a cross-engine pipeline
    should restrict itself to; the hash check enforces the match-set
    equivalence including leftmost-first extraction order.
    ``try_element_at`` spells the no-match→NULL contract under ANSI
    mode (DuckDB's list[1] on an empty list is NULL for free).

    Plan: map-only single codegen'd project over one pushed-down scan
    — regex evaluation is JVM-side (never a Python UDF); at 100 TB
    this runs at scan speed with zero shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("text").rlike("table").alias("has_table"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+e"), F.lit(0)))
        .cast("long")
        .alias("n_e_words"),
        F.regexp_extract("text", "([a-z]+) ([a-z]+)", 2).alias(
            "second_word"
        ),
        F.regexp_replace("text", "[aeiou]", "_").alias("devoweled"),
        F.size(F.split("text", r"\s+")).cast("long").alias("n_ws_tokens"),
        F.try_element_at(
            F.regexp_extract_all("text", F.lit("[a-z]{5,}"), F.lit(0)),
            F.lit(1),
        ).alias("first_long_word"),
    )


@query(
    "fn_hash",
    oracle="""
    SELECT doc_id,
           md5(text) AS md5_hex,
           lower(sha256(text)) AS sha256_hex,
           substring(md5(text), 1, 8) AS md5_prefix
    FROM documents
    """,
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic-hash function surface: md5 and sha-256 of every
    document, hex-encoded — the primitives under every exact-dedup /
    fingerprint key (llm_exact_dedup shards on exactly this md5).

    Both engines emit lowercase hex for md5; sha2(text, 256) (Spark)
    and sha256(text) (DuckDB) agree after a defensive lower().
    Non-portable members of the family are documented rather than
    smuggled in: Spark's xxhash64/murmur3 ``hash()`` have no DuckDB
    twin (different algorithms), so they live in the rows-only sketch
    keys (agg_sketch_partial) and the verifier's own fold, not here.
    Map-only — hashing is embarrassingly parallel at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5("text").alias("md5_hex"),
        F.lower(F.sha2("text", 256)).alias("sha256_hex"),
        F.substring(F.md5("text"), 1, 8).alias("md5_prefix"),
    )


@query(
    "fn_crypto",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(text) AS BIGINT) AS n_roundtrip_exact,
           CAST(SUM((octet_length(encode(text)) // 16 + 1) * 16) AS BIGINT)
             AS sum_ct_bytes,
           bit_xor(CAST('0x' || substr(sha256(text), 1, 15) AS BIGINT))
             AS sha_xor
    FROM documents GROUP BY source
    """,
)
def fn_crypto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crypto function surface: AES-128-ECB encrypt→decrypt round trip
    plus SHA-256 digests over the documents table — the
    column-encryption primitive for PII-bearing lake columns
    (aes_encrypt/aes_decrypt are Spark built-ins; ECB here because the
    battery needs DETERMINISTIC ciphertext — production would use GCM,
    whose random IV is exactly why it can't be hash-checked).

    DuckDB has no AES, so the oracle verifies the hop from the
    PLAINTEXT side, the source_xml roundtrip discipline:
    n_roundtrip_exact counts docs where decrypt(encrypt(text)) equals
    the original byte-for-byte (oracle: COUNT(text) — NULL-safe, any
    corruption breaks equality), and sum_ct_bytes checks a real
    CIPHERTEXT property against its closed form — PKCS#7-padded AES
    length is (utf8_bytes/16 + 1)*16 per doc, where utf8_bytes is
    octet_length(encode(text)) on the DuckDB side so multi-byte text
    (non-ASCII) still matches the real octet_length(ciphertext).  sha_xor cross-checks SHA-256 itself
    (spark sha2 vs duckdb sha256) via the established xor-of-60-bit
    fold.  All map-side expressions; one scan, one tiny agg — scan
    speed at 100 TB, JVM-native crypto (no Python)."""
    key = "0123456789abcdef"
    docs = load_table(spark, sf_dir, "documents")
    enc = F.expr(f"aes_encrypt(text, '{key}', 'ECB')")
    rt = F.expr(
        f"CAST(aes_decrypt(aes_encrypt(text, '{key}', 'ECB'),"
        f" '{key}', 'ECB') AS STRING)"
    )
    return docs.select(
        "source",
        "text",
        F.octet_length(enc).cast("long").alias("ct_bytes"),
        (rt == F.col("text")).cast("int").alias("rt_ok"),
        F.expr(
            "CAST(conv(substr(sha2(text, 256), 1, 15), 16, 10) AS BIGINT)"
        ).alias("sha60"),
    ).groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.coalesce(F.sum("rt_ok"), F.lit(0))
        .cast("long")
        .alias("n_roundtrip_exact"),
        F.sum("ct_bytes").cast("long").alias("sum_ct_bytes"),
        F.expr("bit_xor(sha60)").alias("sha_xor"),
    )


@query(
    "fn_format",
    oracle="""
    SELECT o_orderkey,
           printf('ORD-%08d', o_orderkey) AS order_tag,
           printf('%s/%d', o_orderpriority, CAST(year(o_orderdate) AS INTEGER))
             AS pri_year,
           printf('%.2f', ROUND(o_totalprice, 2)) AS price_str,
           printf('%5d|%-5s|', CAST(o_orderkey % 1000 AS INTEGER),
                  o_orderstatus) AS aligned,
           CAST(length(printf('%08d', o_orderkey)) AS INTEGER) AS tag_len
    FROM orders
    """,
)
def fn_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """printf-style formatting surface (``format_string`` ↔ DuckDB
    ``printf``): zero-padded ids, composed label strings, fixed-2dp
    money rendering, and width/left-align padding — the string
    construction layer under every export file name, partition tag,
    and human-readable report column.

    Portability notes the key pins: both engines implement C-printf
    semantics for %d / %s / %0Nd / %-Ns; ``%.2f`` formats the
    IDENTICAL double (2dp money survives the round trip because the
    value is first ROUNDed to the 2dp grid both engines share — raw
    ``%.2f`` of an unrounded double is a last-ulp trap).

    Map-only codegen'd projections — scan speed at any scale."""
    o = spread(load_table(spark, sf_dir, "orders"), key="o_orderkey")
    return o.select(
        "o_orderkey",
        F.format_string("ORD-%08d", "o_orderkey").alias("order_tag"),
        F.format_string(
            "%s/%d", F.col("o_orderpriority"), F.year("o_orderdate")
        ).alias("pri_year"),
        F.format_string("%.2f", F.round("o_totalprice", 2)).alias("price_str"),
        F.format_string(
            "%5d|%-5s|",
            (F.col("o_orderkey") % 1000).cast("int"),
            F.col("o_orderstatus"),
        ).alias("aligned"),
        F.length(F.format_string("%08d", "o_orderkey")).alias("tag_len"),
    )
