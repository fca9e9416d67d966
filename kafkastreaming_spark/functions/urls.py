"""URL parsing, normalization, and canonical-URL dedup (SURVEY.md §2.8
``fn_url`` + §2.12 ``llm_url_dedup``).

Web-corpus curation lives and dies on URL handling: parse → normalize →
canonicalize → dedup is the first pass every crawl pipeline (CCNet,
RefinedWeb, Dolma) runs before any content-level dedup.  The fixture has
no URL column, so both keys synthesize a deterministic URL per document
from doc_id alone — three spelling variants (scheme case, www prefix,
explicit default port, tracking params, trailing slash) per canonical
target gid = doc_id/3, giving the normalizer real work and the dedup real
duplicate groups (~3 docs per canonical URL by construction).

Dialect discipline: every parse/normalize expression is ONE string
evaluated verbatim by both engines.  Patterns stay in the Java-regex ∩
RE2 portable subset (fn_regexp contract) and use ``[.]``/``[?]`` instead
of backslash escapes (Spark SQL string literals eat backslashes).  All
regexp_replace calls are ANCHORED so DuckDB's first-match default and
Spark's global default coincide.  No floats anywhere — pure string/int
ops, so the keys hash-check exactly.

Scale: both keys are map-only until llm_url_dedup's single groupBy on
the canonical URL (uniform md5-ish key distribution at web scale since
hosts/paths are high-cardinality); at 100 TB this is the cheapest dedup
pass in the pipeline and runs at scan speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreaming_spark.io import load_table
from kafkastreaming_spark.registry import query

# Deterministic URL synthesis: three surface variants per canonical
# target gid = floor(doc_id / 3).  Every URL component derives from gid
# ALONE (not per-doc source/lang, which differ within a gid triplet and
# would make the variants point at different hosts — caught by a
# collapse-rate check, not the hash: both engines agree on a vacuous
# dedup too).  Portable: `div`/`//` differ between engines,
# CAST(floor(x / 3) AS BIGINT) does not (exact for doc_id « 2^52).
_URL_GID = "CAST(CAST(floor(doc_id / 3) AS BIGINT) AS STRING)"
_URL_SITE = "CAST(CAST(floor(doc_id / 3) AS BIGINT) % 97 AS STRING)"
_URL_SYNTH = (
    "CASE CAST(doc_id % 3 AS INTEGER) "
    f"WHEN 0 THEN 'https://crawl-' || {_URL_SITE} || '.example.com/posts"
    f"/doc-' || {_URL_GID} "
    f"WHEN 1 THEN 'HTTPS://WWW.CRAWL-' || {_URL_SITE} || '.EXAMPLE.COM"
    f"/posts/doc-' || {_URL_GID} "
    "|| '/?utm_source=feed&utm_campaign=crawl' "
    f"ELSE 'https://www.crawl-' || {_URL_SITE} || '.example.com:443/posts"
    f"/doc-' || {_URL_GID} "
    "|| '?ref=social&utm_medium=share' END"
)

# Stage 1: raw components out of the URL string.
_URL_S1 = {
    "scheme": "lower(regexp_extract(url, '^([A-Za-z]+)://', 1))",
    "hostport": "lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1))",
    "rawpath": "regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1)",
    "query_str": "regexp_extract(url, '[?]([^#]*)', 1)",
}

# Stage 2: normalized components (anchored replaces only — see module doc).
_URL_S2 = {
    "host": (
        "regexp_replace(regexp_replace(hostport, ':[0-9]+$', ''),"
        " '^www[.]', '')"
    ),
    "port": (
        "CAST(coalesce(nullif(regexp_extract(hostport, ':([0-9]+)$', 1), ''),"
        " '443') AS BIGINT)"
    ),
    "path_norm": (
        "CASE WHEN regexp_replace(rawpath, '/+$', '') = '' THEN '/' "
        "ELSE regexp_replace(rawpath, '/+$', '') END"
    ),
    "n_params": (
        "CAST(CASE WHEN query_str = '' THEN 0 "
        "ELSE length(query_str) - length(replace(query_str, '&', '')) + 1 "
        "END AS BIGINT)"
    ),
    "utm_source": "nullif(regexp_extract(url, '[?&]utm_source=([^&#]*)', 1), '')",
}

# Stage 3: the canonical identity — https, no www, no default port, no
# trailing slash, tracking params dropped (allowlist policy: this corpus
# carries no semantic params; a production pipeline keeps an explicit
# allowlist and sorts surviving params).
_URL_CANON = "'https://' || host || path_norm"


def _stage_sql(stage: dict[str, str], carry: list[str]) -> str:
    keep = ", ".join(carry)
    new = ", ".join(f"{e} AS {k}" for k, e in stage.items())
    return f"SELECT {keep}, {new}"


@query(
    "fn_url",
    oracle=f"""
    WITH s0 AS (
      SELECT doc_id, {_URL_SYNTH} AS url FROM documents
    ),
    s1 AS ({_stage_sql(_URL_S1, ["doc_id", "url"])} FROM s0),
    s2 AS ({_stage_sql(_URL_S2, ["doc_id", "url", "scheme"])} FROM s1)
    SELECT doc_id, url, scheme, host, port, path_norm, n_params,
           utm_source, {_URL_CANON} AS canonical_url
    FROM s2
    """,
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parse + normalize battery: scheme, host (lowercased, www- and
    port-stripped), port (default 443), trailing-slash-normalized path,
    query param count, utm_source extraction, and the canonical URL —
    the exact component set a crawl-curation pipeline filters and
    deduplicates on.  See module docstring for the synthesis scheme and
    the dialect rules; every expression string is shared verbatim with
    the DuckDB oracle.

    Plan: map-only codegen'd projection over one pushed-down scan —
    regex runs JVM-side; at 100 TB this is scan-speed."""
    docs = load_table(spark, sf_dir, "documents")
    s0 = docs.selectExpr("doc_id", f"{_URL_SYNTH} AS url")
    s1 = s0.selectExpr(
        "doc_id", "url", *[f"{e} AS {k}" for k, e in _URL_S1.items()]
    )
    s2 = s1.selectExpr(
        "doc_id", "url", "scheme",
        *[f"{e} AS {k}" for k, e in _URL_S2.items()],
    )
    return s2.selectExpr(
        "doc_id", "url", "scheme", "host", "port", "path_norm", "n_params",
        "utm_source", f"{_URL_CANON} AS canonical_url",
    )


@query(
    "llm_url_dedup",
    oracle=f"""
    WITH s0 AS (
      SELECT doc_id, {_URL_SYNTH} AS url FROM documents
    ),
    s1 AS ({_stage_sql(_URL_S1, ["doc_id", "url"])} FROM s0),
    s2 AS ({_stage_sql(_URL_S2, ["doc_id", "url"])} FROM s1),
    canon AS (
      SELECT doc_id, {_URL_CANON} AS canonical_url FROM s2
    )
    SELECT canonical_url,
           CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) - 1 AS BIGINT) AS n_dropped
    FROM canon GROUP BY canonical_url
    """,
)
def llm_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL dedup — the first dedup pass of every web-corpus
    pipeline (before any content hashing): normalize each document's
    URL to its canonical identity (https, lowercase host, no www, no
    default port, no trailing slash, tracking params dropped) and keep
    the smallest doc_id per canonical URL.  The synthesis builds ~3
    surface variants per target, so the normalizer provably collapses
    scheme-case / www / port / slash / utm noise into real dup groups.

    Plan: map-only normalize, then ONE groupBy on the canonical URL —
    high-cardinality and uniform at web scale, so the shuffle has no
    skew; the keeper is MIN (no window sort).  At 100 TB: hash the
    canonical string to 120 bits first (llm_contamination discipline)
    to shrink shuffle keys from strings to 16 bytes."""
    docs = load_table(spark, sf_dir, "documents")
    s0 = docs.selectExpr("doc_id", f"{_URL_SYNTH} AS url")
    s1 = s0.selectExpr(
        "doc_id", "url", *[f"{e} AS {k}" for k, e in _URL_S1.items()]
    )
    s2 = s1.selectExpr(
        "doc_id", "url", *[f"{e} AS {k}" for k, e in _URL_S2.items()]
    )
    canon = s2.selectExpr("doc_id", f"{_URL_CANON} AS canonical_url")
    return canon.groupBy("canonical_url").agg(
        F.min("doc_id").cast("long").alias("keep_doc_id"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (F.count(F.lit(1)) - 1).cast("long").alias("n_dropped"),
    )
