"""Corpus curation operators — dataset splits, rebalancing, n-gram stats
(extends SURVEY.md §2.11: the bookkeeping every training-data pipeline
runs between dedup and tokenization).

All three are built on the portable 60-bit md5 hash (see
operators/pipeline.py header): assignment decisions are pure functions
of the row key, so they are reproducible across runs, engines, AND
repartitionings — ``df.sample``/``randomSplit`` are none of those.
Everything here is map-side (zero shuffle) except the bigram ranking,
which is one hash-agg + one per-lang window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkastreaming_spark.io import load_table
from kafkastreaming_spark.registry import query

# Portable 60-bit hash of a salted doc key, Spark / DuckDB spellings.
# The salt prefix decorrelates this assignment from every other
# hash-derived decision (dedup buckets, scan_sample) on the same key.
_SPLIT_H_SPARK = (
    "pmod(CAST(conv(substr(md5(concat('{salt}:', CAST(doc_id AS STRING))), 1, 15),"
    " 16, 10) AS BIGINT), 100)"
)
_SPLIT_H_DUCK = (
    "CAST('0x' || substr(md5(concat('{salt}:', CAST(doc_id AS VARCHAR))), 1, 15)"
    " AS BIGINT) % 100"
)


@query(
    "llm_train_test_split",
    oracle=f"""
    SELECT doc_id,
           {_SPLIT_H_DUCK.format(salt='split')} AS bucket,
           CASE WHEN {_SPLIT_H_DUCK.format(salt='split')} < 80 THEN 'train'
                WHEN {_SPLIT_H_DUCK.format(salt='split')} < 90 THEN 'valid'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def llm_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/valid/test assignment by salted key
    hash.

    Why not ``randomSplit``: hash assignment is (a) stable across runs
    and Spark versions, (b) independent of partitioning, and (c)
    CONSISTENT — a doc joins the same split in every derived table, so
    features computed elsewhere never leak across the boundary.  The
    hash is positive (< 2^60), so Spark ``pmod`` ≡ DuckDB ``%``.
    Map-only: at 100 TB this is a free column, typically materialized
    as a partition key so each split prunes to its own files."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.expr(_SPLIT_H_SPARK.format(salt="split"))
    return docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < 80, "train")
        .when(bucket < 90, "valid")
        .otherwise("test")
        .alias("split"),
    )


@query(
    "llm_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE {_SPLIT_H_DUCK.format(salt='strat')}
          < CASE WHEN lang = 'en' THEN 20 ELSE 60 END
    """,
)
def llm_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified (per-language) hash sample: English — the dominant
    stratum in this corpus — at 20%, every other language at 60%.

    This is the corpus REBALANCING step of a multilingual training mix:
    per-stratum rates are policy (a dict, here a CASE), membership is a
    deterministic salted hash so the sample is reproducible and
    join-consistent.  Map-only with the predicate evaluated at the scan
    — at 100 TB with lang as a partition key the dominant-language
    directories are the only ones that still need row-level filtering."""
    docs = load_table(spark, sf_dir, "documents")
    rate = F.when(F.col("lang") == "en", 20).otherwise(60)
    return docs.filter(
        F.expr(_SPLIT_H_SPARK.format(salt="strat")) < rate
    ).select("doc_id", "lang", "source")


@query(
    "llm_bigram_stats",
    oracle="""
    WITH toks AS (
      SELECT lang, string_split(text, ' ') AS tk FROM documents
    ),
    big AS (
      SELECT lang, tk[i] || ' ' || tk[i + 1] AS bigram
      FROM toks, unnest(generate_series(1, len(tk) - 1)) AS t(i)
    ),
    counted AS (
      SELECT lang, bigram, COUNT(*) AS n FROM big GROUP BY lang, bigram
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY lang
                                   ORDER BY n DESC, bigram) AS rnk
      FROM counted
    )
    SELECT lang, bigram, n, rnk FROM ranked WHERE rnk <= 3
    """,
)
def llm_bigram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 bigrams per language by count (ties → lexicographic) — the
    n-gram language-model statistic behind contamination checks and
    boilerplate detection.

    Bigram generation is a per-row array expression (sequence +
    transform + 1-based element_at, mirroring DuckDB's 1-based list
    index), then ONE hash-agg on (lang, bigram) — partial aggregation
    collapses each map partition before the shuffle, so network volume
    is bounded by distinct bigrams per partition, not corpus tokens —
    and one tiny per-lang window for the top-3.

    The token array is bound ONCE per row (``tk``) before the lambda —
    inlining ``split`` inside the transform re-tokenizes the document
    per bigram, turning an O(tokens) row into O(tokens²).  Documents
    with fewer than two tokens produce an empty array (``sequence(1,0)``
    is DESCENDING in Spark, and ``element_at(tk, 0)`` would throw), and
    ``explode`` drops them — exactly the oracle's ``generate_series(1,0)``
    emitting no rows."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("lang", F.split("text", " ").alias("tk"))
    big = toks.select(
        "lang",
        F.explode(
            F.expr(
                "CASE WHEN size(tk) < 2 THEN array()"
                " ELSE transform(sequence(1, size(tk) - 1),"
                "   i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1)))"
                " END"
            )
        ).alias("bigram"),
    )
    counted = big.groupBy("lang", "bigram").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("bigram"))
    return (
        counted.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("lang", "bigram", "n", "rnk")
    )
