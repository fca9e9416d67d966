"""Multimodal (opaque-binary) columns: ingest, frame sampling, decode
plumbing (driver north star; extends SURVEY.md §2.11).

Media (image/audio/video) is modeled as an opaque ``binary`` payload
column plus typed metadata — here synthesized as the UTF-8 encoding of
``documents.text`` so every engine sees identical bytes.  The corpus is
ASCII by construction, so DuckDB's string functions (which hash/slice
UTF-8 text) agree byte-for-byte with Spark's binary functions; the
oracle exploits that: ``sha2(payload, 256)`` ≡ ``sha256(text)``.

The decode stage (`mm_decode_features`) is the real Spark plumbing a
media pipeline needs — Arrow-batched ``mapInPandas`` over binary
payloads, explicit output schema, per-batch vectorized feature math.
The actual codec call is stubbed (no image/audio libs in this sandbox):
``_real_decode`` raises ``NotImplementedError``, and a deterministic
byte-histogram fake stands in, so the distributed plumbing is fully
exercised and tested while the codec remains a drop-in.

Scale: payloads at 100 TB live in parquet binary columns (or pointers
into object storage); ``mapInPandas`` streams Arrow batches so executor
memory is bounded by batch size, not partition size — set
``spark.sql.execution.arrow.maxRecordsPerBatch`` to keep
(records × payload) within executor budget.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafkastreaming_spark.io import load_table
from kafkastreaming_spark.registry import query


def _with_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + opaque binary payload column (the media blob)."""
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.encode("text", "utf-8").alias("payload"),
    )


@query(
    "mm_ingest",
    oracle="""
    SELECT doc_id, lang,
           'text/plain' AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS payload_sha
    FROM documents
    """,
)
def mm_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media ingest manifest: typed metadata (mime, byte length, content
    hash) per opaque payload — the dedup/integrity layer of a media lake.
    Content-hash is the exact-dedup key for binary blobs, the direct
    analogue of ``llm_exact_dedup``'s md5(text)."""
    return _with_payload(spark, sf_dir).select(
        "doc_id",
        "lang",
        F.lit("text/plain").alias("media_type"),
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.sha2("payload", 256).alias("payload_sha"),
    )


@query(
    "mm_frame_sample",
    oracle="""
    WITH f AS (
      SELECT doc_id,
             unnest(generate_series(0, (octet_length(encode(text)) - 32) // 64))
               AS frame_idx,
             text
      FROM documents
      WHERE octet_length(encode(text)) >= 32
    )
    SELECT doc_id, frame_idx,
           sha256(substring(text, CAST(frame_idx * 64 + 1 AS INTEGER), 32))
             AS frame_sha
    FROM f
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over an opaque payload: every other 32-byte window
    (stride 64) hashed — the video-keyframe / audio-chunk access pattern,
    done JVM-side with zero Python.

    ``sequence`` + ``explode`` fans each payload into its frames; at
    100 TB the fanout is map-side only (no shuffle) and frames inherit
    the payload partitioning."""
    return (
        _with_payload(spark, sf_dir)
        # guard sub-frame payloads: Spark's int cast truncates toward zero
        # while the oracle's // floors, so a <32-byte payload would diverge
        .filter(F.octet_length("payload") >= 32)
        .select(
            "doc_id",
            "payload",
            F.explode(
                F.expr("sequence(0, CAST((octet_length(payload) - 32) / 64 AS INT))")
            ).alias("frame_idx"),
        )
        .select(
            "doc_id",
            "frame_idx",
            F.sha2(F.expr("substring(payload, frame_idx * 64 + 1, 32)"), 256).alias(
                "frame_sha"
            ),
        )
    )


_FEAT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        # canonical CSV of the 16 integer histogram bins: arrays are not
        # hashable by the driver's canonicalizer (CORRECTNESS_r01), and the
        # integer form sidesteps cross-engine float formatting entirely
        T.StructField("features_csv", T.StringType()),
    ]
)


def _real_decode(payload: bytes):  # pragma: no cover - sandbox has no codecs
    """Production decode hook (PIL / torchaudio / pyav).  Not available
    in this sandbox — a deployment swaps this in; the Spark plumbing
    around it is identical."""
    raise NotImplementedError(
        "media codecs are not installed in this environment; "
        "_fake_decode provides the deterministic stand-in"
    )


def _fake_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic stand-in: 'dimensions' from byte length, 'features'
    = 16-bin high-nibble byte histogram (raw integer counts)."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    # The DuckDB oracle counts CHARS (length(text), codepoint classes);
    # this kernel counts BYTES.  They agree only on ASCII — fail loudly
    # on a non-ASCII fixture instead of silently diverging (ADVICE r2).
    if (arr >= 128).any():
        raise ValueError(
            "mm_decode_features stand-in assumes ASCII payloads; found a "
            "non-ASCII byte — align the oracle to byte semantics first"
        )
    hist = np.bincount(arr >> 4, minlength=16)
    return len(arr) % 64 + 1, len(arr) // 64 + 1, hist


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: one Arrow batch in, one feature batch out."""
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            try:
                w, h, feats = _real_decode(bytes(payload))
            except NotImplementedError:
                w, h, feats = _fake_decode(bytes(payload))
            rows.append(
                (
                    int(doc_id),
                    w,
                    h,
                    len(payload),
                    ",".join(str(int(c)) for c in feats),
                )
            )
        yield pd.DataFrame(
            rows, columns=["doc_id", "width", "height", "n_bytes", "features_csv"]
        )


def _nibble_count_sql(b: int) -> str:
    """DuckDB expression counting chars whose codepoint >> 4 == b (RE2 hex
    class; ASCII corpus so char count == byte count)."""
    lo, hi = b * 16, b * 16 + 15
    return (
        f"length(text) - length(regexp_replace(text, "
        f"'[\\x{lo:02x}-\\x{hi:02x}]', '', 'g'))"
    )


@query(
    "mm_decode_features",
    oracle=f"""
    SELECT doc_id,
           CAST(length(text) % 64 + 1 AS INTEGER) AS width,
           CAST(length(text) // 64 + 1 AS INTEGER) AS height,
           CAST(length(text) AS BIGINT) AS n_bytes,
           concat_ws(',', {", ".join(_nibble_count_sql(b) for b in range(16))})
             AS features_csv
    FROM documents
    """,
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract via Arrow-batched ``mapInPandas``.

    This is the canonical media-decode topology: binary column in, typed
    struct out, Python touched once per Arrow batch — swap
    ``_real_decode`` for a codec and nothing else changes.  The fake
    decoder's nibble histogram is emitted as a canonical integer CSV so
    the driver can hash it AND DuckDB can reproduce it (16 regexp
    char-class counts) — a full value oracle, not just rows-only."""
    return _with_payload(spark, sf_dir).mapInPandas(_decode_batches, _FEAT_SCHEMA)


@query(
    "mm_dedup_binary",
    oracle="""
    WITH payloads AS (
      SELECT doc_id, lang,
             sha256(text) AS payload_sha,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents
    ),
    per_sha AS (
      SELECT lang, payload_sha,
             COUNT(*) AS cnt,
             MIN(n_bytes) AS n_bytes,
             MIN(doc_id) AS keep_doc
      FROM payloads GROUP BY lang, payload_sha
    )
    SELECT lang,
           CAST(SUM(cnt) AS BIGINT) AS n_payloads,
           COUNT(*) AS n_unique,
           CAST(SUM(cnt - 1) AS BIGINT) AS n_dup_rows,
           CAST(SUM(cnt * n_bytes) AS BIGINT) AS bytes_total,
           CAST(SUM((cnt - 1) * n_bytes) AS BIGINT) AS bytes_saved
    FROM per_sha GROUP BY lang
    """,
)
def mm_dedup_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact binary dedup for the media lake: group opaque payloads by
    content hash (sha-256) within each language shard, keep the earliest
    doc per hash, and report the storage ledger — payload count, unique
    count, duplicate rows, and bytes reclaimed.

    This is llm_exact_dedup lifted to BINARY columns: the content hash
    is computed map-side on the opaque payload (never decoded), the
    shuffle key is the uniform 256-bit digest (no skew by construction),
    and the second aggregation is over the already-tiny per-hash table.
    At 100 TB of media this ledger IS the dedup business case; the
    keep_doc column generalizes to the same cluster-canonical policies
    as the text path (llm_dedup_clusters / graph_pagerank)."""
    payloads = _with_payload(spark, sf_dir).select(
        "doc_id",
        "lang",
        F.sha2("payload", 256).alias("payload_sha"),
        F.octet_length("payload").cast("long").alias("n_bytes"),
    )
    per_sha = payloads.groupBy("lang", "payload_sha").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min("n_bytes").alias("n_bytes"),
        F.min("doc_id").alias("keep_doc"),
    )
    return per_sha.groupBy("lang").agg(
        F.sum("cnt").cast("bigint").alias("n_payloads"),
        F.count(F.lit(1)).alias("n_unique"),
        F.sum(F.col("cnt") - 1).cast("bigint").alias("n_dup_rows"),
        F.sum(F.col("cnt") * F.col("n_bytes")).cast("bigint").alias("bytes_total"),
        F.sum((F.col("cnt") - 1) * F.col("n_bytes"))
        .cast("bigint")
        .alias("bytes_saved"),
    )
