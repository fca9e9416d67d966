"""Scan / source / sink operators (SURVEY.md §2.1).

The design rule: every scan is a plain ``spark.read.parquet`` so Catalyst
pushes predicates into parquet row-group filters and prunes columns at the
reader (check: ``.explain("formatted")`` shows ``PushedFilters`` and a
narrow ``ReadSchema``).  At 100 TB these same queries hit partitioned
directory layouts and additionally get partition pruning for free.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreaming_spark.io import (
    EVENTS_ORACLE_CTE,
    load_table,
    session_cores,
    spread,
)
from kafkastreaming_spark.registry import query


def _sink_path(name: str, sf_dir: str) -> str:
    """Per-process, per-scale-factor sink dir: concurrent runs (pytest +
    driver harness, or different SFs) must never overwrite each other
    mid-read-back."""
    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    return os.path.join(tempfile.gettempdir(), f"{name}_{sf_tag}_{os.getpid()}")


@query(
    "scan_parquet",
    oracle="SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem",
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan with column projection — ReadSchema is 4 of 11 columns."""
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


@query(
    "scan_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_quantity > 45.0
    """,
)
def scan_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range + comparison predicates pushed into the parquet reader.

    ``.explain`` shows PushedFilters: [GreaterThanOrEqual(l_shipdate,...),
    LessThan(l_shipdate,...), GreaterThan(l_quantity,45.0)] — at 100 TB this
    skips whole row groups via min/max statistics before any CPU is spent.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_quantity") > 45.0)
    ).select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")


@query(
    "scan_events_ns",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE}
    SELECT event_id, ts, user_id, event_type, value
    FROM events WHERE event_type = 'purchase'
    """,
)
def scan_events_ns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nanosecond-timestamp ingestion shim (SURVEY.md §7.5).

    Spark 4.1.2 cannot read TIMESTAMP(NANOS) parquet natively; io.load_table
    reads int64 nanos (legacy.parquet.nanosAsLong) and converts with integer
    division to exact microseconds, matching DuckDB's native TIMESTAMP_NS
    read truncated to microseconds.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


@query(
    "sink_parquet",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE}
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(24,8))), 2) AS DOUBLE) AS total_value
    FROM events GROUP BY event_type
    """,
)
def sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch parquet sink: aggregate → write parquet → read back.

    Proves the write path round-trips types/values exactly.  In production
    the same ``.write.parquet`` targets object storage with
    ``partitionBy(...)`` for downstream partition pruning.
    """
    ev = load_table(spark, sf_dir, "events")
    out = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum(F.col("value").cast("decimal(24,8)")), 2)
        .cast("double")
        .alias("total_value"),
    )
    path = _sink_path("ks_spark_sink_parquet", sf_dir)
    out.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def _bucketed_join(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, str, str]:
    """Write orders/customer bucketed 8 ways on the join key and build the
    co-located merge join; returns (lazy joined DF, the two table names).
    Split out so the plan-assertion test can inspect the join plan before
    ``sink_bucketed`` materializes it and drops the tables."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    sf_tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    t_ord, t_cust = f"bkt_orders_{sf_tag}_{os.getpid()}", f"bkt_cust_{sf_tag}_{os.getpid()}"

    # r17 (guide §2.6 overlap independent jobs): the two bucketed writes
    # are independent (different tables), so submit them concurrently —
    # each write's bucket layout is unchanged, the merge join stays
    # exchange-free.  A/B 4/4 pairs faster, median ratio 0.74.
    from concurrent.futures import ThreadPoolExecutor

    def _write(args) -> None:
        df, key, table = args
        df.write.mode("overwrite").bucketBy(8, key).sortBy(key).saveAsTable(
            table
        )

    with ThreadPoolExecutor(max_workers=2) as pool:
        list(
            pool.map(
                _write,
                (
                    (orders, "o_custkey", t_ord),
                    (customer, "c_custkey", t_cust),
                ),
            )
        )
    bo, bc = spark.table(t_ord), spark.table(t_cust)
    joined = (
        bo.hint("merge")
        .join(bc, bo["o_custkey"] == bc["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(24,8)")), 2)
            .cast("double")
            .alias("total_price"),
        )
    )
    return joined, t_ord, t_cust


def drop_bucketed_tables(spark: SparkSession, *tables: str) -> None:
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


@query(
    "sink_bucketed",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(24,8))), 2) AS DOUBLE)
             AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def sink_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-table co-located join: write orders and customer bucketed
    8 ways on the join key (``bucketBy`` + ``sortBy``), then join the two
    bucketed tables with a merge hint — Spark aligns bucket files
    one-to-one and the join runs with NO Exchange on either side
    (plan-asserted in tests/test_plans.py: no ``hashpartitioning`` on
    either join key).

    This is the 100 TB fact-fact join strategy: pay the shuffle ONCE at
    write time, then every subsequent join/aggregation on the bucket key
    is shuffle-free.  The same layout serves `repartition`-style
    co-location for any downstream consumer of the table."""
    joined, t_ord, t_cust = _bucketed_join(spark, sf_dir)
    # Materialize before dropping the pid-suffixed tables: without the
    # drop, every process left two more tables in spark-warehouse (ADVICE
    # r2) — the warehouse grew without bound across runs.
    result = joined.localCheckpoint(eager=True)
    drop_bucketed_tables(spark, t_ord, t_cust)
    return result


@query(
    "sink_partitioned",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE}
    SELECT event_id, user_id, event_type, value
    FROM events WHERE event_type IN ('click', 'purchase')
    """,
)
def sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned-layout round trip: write events partitioned by
    event_type (the SCALE.md fact-table layout), read back with a
    partition filter — the plan prunes to the two matching directories
    (``PartitionFilters`` in explain; asserted in tests/test_plans.py)
    instead of scanning the table.

    This is the mechanism that makes 100 TB scans affordable: partition
    pruning happens at file listing, before any row is read."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    path = _sink_path("ks_spark_sink_partitioned", sf_dir)
    ev.write.mode("overwrite").partitionBy("event_type").parquet(path)
    back = spark.read.parquet(path).filter(
        F.col("event_type").isin("click", "purchase")
    )
    # partition column comes back last and typed string; restore order
    return back.select("event_id", "user_id", "event_type", "value")


@query(
    "source_jsonl",
    oracle="""
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           bit_xor(CAST('0x' || substr(md5(text), 1, 15) AS BIGINT))
             AS text_hash_xor
    FROM documents GROUP BY lang, source
    """,
)
def source_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source: write the documents table as JSONL, read it
    back with an EXPLICIT schema, and prove byte-exact text fidelity
    with a per-group xor of the portable 60-bit md5 hash (xor, not sum —
    order-independent AND overflow-free; the oracle computes the same
    digest from the original parquet, so any JSON escaping loss breaks
    the hash).

    The reference's wire format is JSON-on-Kafka; this is the batch
    twin of that deserializer.  Explicit schema matters at scale: schema
    inference is a full extra pass over 100 TB, and a drifting inferred
    type (long -> double) silently corrupts downstream arithmetic."""
    docs = load_table(spark, sf_dir, "documents")
    path = _sink_path("ks_spark_source_jsonl", sf_dir)
    docs.write.mode("overwrite").json(path)
    back = spark.read.schema(docs.schema).json(path)
    return back.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.expr(
            "bit_xor(CAST(conv(substr(md5(text), 1, 15), 16, 10) AS BIGINT))"
        ).alias("text_hash_xor"),
    )


@query(
    "scan_union_schema",
    oracle="""
    WITH merged AS (
      SELECT l_orderkey, l_quantity, CAST(NULL AS DOUBLE) AS l_extendedprice
      FROM lineitem WHERE l_orderkey % 4 = 0
      UNION ALL
      SELECT l_orderkey, CAST(NULL AS DOUBLE), l_extendedprice
      FROM lineitem WHERE l_orderkey % 4 = 0
    )
    SELECT COUNT(*) AS n_rows,
           COUNT(l_quantity) AS n_qty,
           COUNT(l_extendedprice) AS n_price,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(24,8))), 2) AS DOUBLE)
             AS sum_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(24,8))), 2)
                AS DOUBLE) AS sum_price,
           COUNT(DISTINCT l_orderkey) AS n_orders
    FROM merged
    """,
)
def scan_union_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution scan: two parquet directories written with
    DIFFERENT column subsets (the before/after of an added column) read
    back in one scan with ``mergeSchema`` — missing columns surface as
    NULLs, never as errors or silent drops.

    This is the lakehouse reality at 100 TB: a table's schema drifts
    over years of writers, and the reader must reconcile footers
    per-file.  mergeSchema costs a footer pass over every file, so
    production tables pin the merged schema in a catalog instead —
    but the READ semantics verified here are identical."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.expr("l_orderkey % 4 = 0")
    )
    base = _sink_path("ks_spark_scan_union_schema", sf_dir)
    a_path, b_path = f"{base}/v1", f"{base}/v2"
    # r17 (guide §2.6 overlap independent jobs): the two version writes
    # are independent, so submit them from a 2-thread pool and let the
    # second job's tasks back-fill the first's tail instead of running
    # the writes end-to-end sequentially.  Values identical (separate
    # paths, same rows); A/B 4/4 pairs faster, median ratio 0.68.
    from concurrent.futures import ThreadPoolExecutor

    def _write(args) -> None:
        cols, path = args
        li.select(*cols).write.mode("overwrite").parquet(path)

    with ThreadPoolExecutor(max_workers=2) as pool:
        list(
            pool.map(
                _write,
                (
                    (("l_orderkey", "l_quantity"), a_path),
                    (("l_orderkey", "l_extendedprice"), b_path),
                ),
            )
        )
    merged = spark.read.option("mergeSchema", "true").parquet(a_path, b_path)
    return merged.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("l_quantity").alias("n_qty"),
        F.count("l_extendedprice").alias("n_price"),
        F.round(F.sum(F.col("l_quantity").cast("decimal(24,8)")), 2)
        .cast("double")
        .alias("sum_qty"),
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(24,8)")), 2)
        .cast("double")
        .alias("sum_price"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


# binary-file fixture dirs already written by THIS process (one file per
# document; reused across bench repeats and test/driver invocations)
_BINFILES_BUILT: set[str] = set()


@query(
    "source_binaryfile",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS content_sha
    FROM documents
    """,
)
def source_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``binaryFile`` source — the ingestion path of a media lake: one
    opaque file per asset (image/audio/any blob) read as (path,
    modificationTime, length, content) with no decoding.  The fixture
    is one file per document payload (= utf-8 text bytes, the
    multimodal.py convention), written executor-side in Arrow batches;
    the read-back manifests (doc_id parsed from the file name, byte
    length, sha256) and the oracle recomputes all three from the
    documents table — a lost, truncated, or bit-flipped file breaks the
    hash.

    Scale: binaryFile is how raw media corpora ENTER Spark; the driver
    lists files once (at 100 TB you shard the listing by directory
    partitioning) and each task reads whole files — so the very next
    pipeline step should consolidate small files into parquet binary
    columns (``mm_ingest``), which every downstream key here assumes.
    ``pathGlobFilter`` prunes non-payload files without reading them."""
    import pandas as pd

    base = _sink_path("ks_spark_binfiles", sf_dir)
    if base not in _BINFILES_BUILT:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", F.encode("text", "utf-8").alias("payload")
        )

        def write_files(batches):
            os.makedirs(base, exist_ok=True)
            n = 0
            for pdf in batches:
                for did, pay in zip(pdf["doc_id"], pdf["payload"]):
                    fp = os.path.join(base, f"doc_{int(did)}.bin")
                    with open(fp, "wb") as f:
                        f.write(bytes(pay))
                    n += 1
            yield pd.DataFrame({"n": [n]})

        docs.mapInPandas(write_files, "n long").agg(F.sum("n")).collect()
        _BINFILES_BUILT.add(base)

    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(base)
    )
    # r16: binaryFile plans ~one task per small file (openCost-dominated
    # split packing) — 5k scheduling-overhead tasks at sf0.1, measured 8x
    # slower than reading the same bytes in core-sized tasks.  coalesce
    # (shuffle-free) packs the splits down to max(cores, total/128MB)
    # tasks; on a big media lake the 128MB-per-task floor keeps the target
    # at or above the planned partition count, so coalesce is a no-op.
    # The size probe is driver-side os.scandir, which only works for
    # local paths — on an object store it degrades to the raw plan
    # instead of crashing (ADVICE r16).
    try:
        tot_bytes = sum(
            e.stat().st_size
            for e in os.scandir(base)
            if e.name.endswith(".bin")
        )
    except OSError:
        tot_bytes = None
    if tot_bytes is not None:
        bf = bf.coalesce(
            max(session_cores(), 1 + tot_bytes // (128 << 20))
        )
    return bf.select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin$", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("length").cast("long").alias("n_bytes"),
        F.sha2("content", 256).alias("content_sha"),
    )


@query(
    "source_csv",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           bit_xor(CAST('0x' || substr(md5(text), 1, 15) AS BIGINT))
             AS text_hash_xor
    FROM documents GROUP BY lang
    """,
)
def source_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source roundtrip with explicit schema + header: free text
    survives quoting/escaping byte-exactly (xor-of-hash fidelity check
    against the original parquet, same scheme as source_jsonl).

    CSV is the interchange format every pipeline still ingests; the
    scale rule is the same as JSONL — explicit schema (no inference
    pass), and quote/escape options pinned in code, not guessed."""
    docs = load_table(spark, sf_dir, "documents")
    path = _sink_path("ks_spark_source_csv", sf_dir)
    docs.write.mode("overwrite").option("header", "true").csv(path)
    back = spark.read.schema(docs.schema).option("header", "true").csv(path)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.expr(
            "bit_xor(CAST(conv(substr(md5(text), 1, 15), 16, 10) AS BIGINT))"
        ).alias("text_hash_xor"),
    )


@query(
    "source_orc",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           bit_xor(CAST('0x' || substr(md5(text), 1, 15) AS BIGINT))
             AS text_hash_xor
    FROM documents GROUP BY source
    """,
)
def source_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source roundtrip: write the documents table as ORC, read it
    back, prove byte-exact text fidelity per source with the same
    xor-of-60-bit-hash scheme as source_csv/source_jsonl.

    ORC is the other columnar lake format a Spark engine must ingest
    (Hive-era lakes are full of it); Spark's reader is native and
    vectorized, with the same predicate-pushdown / column-pruning
    surface as parquet — at 100 TB an ORC scan prunes row groups by
    min/max exactly like parquet, so queries are layout-portable."""
    docs = load_table(spark, sf_dir, "documents")
    path = _sink_path("ks_spark_source_orc", sf_dir)
    docs.write.mode("overwrite").orc(path)
    back = spark.read.schema(docs.schema).orc(path)
    return back.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.expr(
            "bit_xor(CAST(conv(substr(md5(text), 1, 15), 16, 10) AS BIGINT))"
        ).alias("text_hash_xor"),
    )


@query(
    "sink_compaction",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE}
    SELECT event_type,
           COUNT(*) AS n_events,
           bit_xor(CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15)
                   AS BIGINT)) AS id_hash_xor
    FROM events GROUP BY event_type
    """,
)
def sink_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction (the OPTIMIZE / bin-packing rewrite every
    100 TB lake runs): events are first written as 64 deliberately tiny
    files (the pathological layout streaming ingestion leaves behind —
    at scale, listing + footer reads of millions of small files dominate
    scan cost), then compacted with a shuffle-free ``coalesce`` rewrite
    into 4 right-sized files.

    Correctness of a compaction job is exactly "no row lost, none
    duplicated, none altered" — so the returned profile aggregates the
    COMPACTED table per event_type with an order-free xor of the
    portable 60-bit md5 of each event_id, and the oracle computes the
    same digest from the ORIGINAL table: any dropped/duplicated row
    breaks the hash.  File counts before/after are pinned in pytest.
    ``coalesce`` (not ``repartition``) is the production choice: it
    merges map-side with no shuffle; repartition would re-shuffle the
    table to fix a layout problem."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    small = _sink_path("ks_spark_sink_compact_small", sf_dir)
    ev.repartition(64).write.mode("overwrite").parquet(small)
    compacted = _sink_path("ks_spark_sink_compact_big", sf_dir)
    spark.read.parquet(small).coalesce(4).write.mode("overwrite").parquet(
        compacted
    )
    back = spark.read.parquet(compacted)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr(
            "bit_xor(CAST(conv(substr(md5(CAST(event_id AS STRING)), 1, 15),"
            " 16, 10) AS BIGINT))"
        ).alias("id_hash_xor"),
    )


@query(
    "sink_jsonl",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey,
           CAST(n_orders AS BIGINT) AS n_orders
    FROM (
      SELECT n.n_nationkey, n.n_name, n.n_regionkey,
             COUNT(o.o_orderkey) AS n_orders
      FROM nation n
      LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY n.n_nationkey, n.n_name, n.n_regionkey
    )
    """,
)
def sink_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink round-trip — the interchange format every
    downstream training job and Kafka topic speaks: aggregate, write
    ``.write.json`` (one JSON object per line, gzip-able, splittable),
    read back with an EXPLICIT schema so types survive the trip.

    The read-back schema is pinned from the written DataFrame rather
    than inferred — JSON inference demotes ints that happen to look
    float-ish and reorders columns; schema-on-read is the production
    contract (same discipline as source_jsonl).  The aggregate keeps
    to ints only, because JSON has no decimal type — the honest
    statement of the format's limits.  At 100 TB you write partitioned
    gzip JSONL for interchange and parquet for re-reads; the plan here
    (broadcast dims, one count agg) is scan-shaped either way."""
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    agg = (
        nation.join(
            cust, cust.c_nationkey == nation.n_nationkey, "left"
        )
        .join(orders, orders.o_custkey == cust.c_custkey, "left")
        .groupBy("n_nationkey", "n_name", "n_regionkey")
        .agg(F.count("o_orderkey").cast("long").alias("n_orders"))
    )
    path = _sink_path("ks_spark_sink_jsonl", sf_dir)
    agg.write.mode("overwrite").json(path)
    return spark.read.schema(agg.schema).json(path)


@query(
    "sink_clustered",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE}
    SELECT event_id, ts, user_id, event_type, value FROM events
    """,
)
def sink_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-CLUSTERED layout round trip — the Z-order/liquid-clustering
    analog buildable from first principles: ``repartitionByRange`` on
    user_id (contiguous, non-overlapping key ranges per output file) +
    ``sortWithinPartitions(user_id, ts)`` so each file is internally
    ordered too, then a full-fidelity read-back (hash-checked against
    the plain projection — clustering must never change CONTENT).

    Why this layout earns its extra shuffle at 100 TB: parquet keeps
    per-file/per-row-group min-max stats, so a point or range predicate
    on the cluster key prunes to the ONE file whose range covers it —
    the same effect partition directories give coarse keys, but for
    high-cardinality keys where one-directory-per-value is untenable.
    tests/test_plans.py pins the property itself: per-file user_id
    ranges are pairwise disjoint.  RangePartitioning samples the key
    distribution, so file sizes stay balanced under skew (hash
    bucketing's fixed modulo cannot adapt)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    path = _sink_path("ks_spark_sink_clustered", sf_dir)
    (
        ev.repartitionByRange(8, "user_id")
        .sortWithinPartitions("user_id", "ts")
        .write.mode("overwrite")
        .parquet(path)
    )
    return spark.read.parquet(path).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


@query(
    "source_xml",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           bit_xor(CAST('0x' || substr(md5(text), 1, 15) AS BIGINT))
             AS text_hash_xor,
           bit_xor(CAST('0x' || substr(md5(lang), 1, 15) AS BIGINT))
             AS lang_hash_xor
    FROM documents GROUP BY source
    """,
)
def source_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML source roundtrip (Spark 4's NATIVE xml data source — the
    spark-xml package folded into core): write documents as one
    <row>-per-record XML tree, read it back with an explicit schema,
    and prove byte-exact fidelity of both free text and a second
    string column per source group with the xor-of-60-bit-hash scheme
    (source_csv/jsonl/orc discipline).  XML survives entity escaping
    (&amp;/&lt;) round-trip — exactly what the hash would catch.

    XML is the classic enterprise feed format (SEC filings, PubMed,
    Wikipedia dumps, SOAP exports); the scale rules match JSONL: an
    explicit schema skips the inference pass, one file per partition,
    and the rowTag streaming parser keeps memory bounded per record —
    at 100 TB ingestion parallelizes per file split like any text
    source.  DuckDB has no XML reader, so the oracle recomputes the
    same aggregate from the original parquet — the check pins that
    the XML hop changed NOTHING."""
    docs = load_table(spark, sf_dir, "documents")
    path = _sink_path("ks_spark_source_xml", sf_dir)
    (
        docs.write.mode("overwrite")
        .format("xml")
        .option("rootTag", "docs")
        .option("rowTag", "doc")
        .save(path)
    )
    back = (
        spark.read.schema(docs.schema)
        .format("xml")
        .option("rowTag", "doc")
        .load(path)
    )
    return back.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.expr(
            "bit_xor(CAST(conv(substr(md5(text), 1, 15), 16, 10) AS BIGINT))"
        ).alias("text_hash_xor"),
        F.expr(
            "bit_xor(CAST(conv(substr(md5(lang), 1, 15), 16, 10) AS BIGINT))"
        ).alias("lang_hash_xor"),
    )


@query(
    "scan_metadata",
    oracle="""
    SELECT 'lineitem.parquet' AS file_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_row_idx,
           bit_xor(l_orderkey * 8 + l_linenumber) AS key_xor
    FROM lineitem
    """,
)
def scan_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hidden file-metadata columns (``_metadata.file_name`` /
    ``file_size`` / ``row_index``) — the lineage surface every
    backfill-debugging and bad-file-quarantine job reads ("which file
    did this row come from").

    The oracle can't see the filesystem, so it pins the INVARIANTS:
    the fixture's file basename is a constant at every SF,
    ``row_index`` is unique within a file (COUNT(DISTINCT) folds to
    COUNT(*)), ``file_size`` is positive (spelled as a filter that
    must drop nothing), and the per-file row population is pinned by
    an exact key xor.  A wrong file name, duplicated/skipped row
    index, or zero size all break the hash.

    Scale: metadata columns are constant-per-split virtual columns —
    zero I/O added to the scan; grouping by file_name is the standard
    per-file audit rollup (small-files detection pairs it with
    ``file_size``)."""
    li = spark.read.parquet(f"{sf_dir.rstrip('/')}/lineitem.parquet")
    # r16: spread AFTER binding the _metadata columns (they are split-local
    # virtual columns; values are fixed at the scan, so the repartition
    # only parallelizes the distinct/xor partial aggregation — guide §2.5).
    return (
        spread(li.select(
            F.col("_metadata.file_name").alias("file_name"),
            F.col("_metadata.file_size").alias("fsz"),
            F.col("_metadata.row_index").alias("ridx"),
            (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("key"),
        ), key="ridx")
        .filter(F.col("fsz") > 0)
        .groupBy("file_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct("ridx").cast("long").alias("n_row_idx"),
            F.expr("bit_xor(key)").alias("key_xor"),
        )
    )


def _z_interleave(xcol: str, ycol: str, bits: int = 8) -> str:
    """SQL expression interleaving the low ``bits`` of two nonnegative
    ints into a Z-order (Morton) value — x in even bit positions, y in
    odd.  Pure integer shifts/masks, evaluated identically by Spark and
    DuckDB."""
    terms = []
    for k in range(bits):
        terms.append(f"((({xcol} >> {k}) & 1) << {2 * k})")
        terms.append(f"((({ycol} >> {k}) & 1) << {2 * k + 1})")
    return " + ".join(terms)


@query(
    "sink_zorder",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE},
    pts AS (
      SELECT user_id % 256 AS x,
             CAST(ROUND(value * 100) AS BIGINT) % 256 AS y
      FROM events WHERE value IS NOT NULL
    ),
    z AS (
      SELECT x, y, ({_z_interleave('x', 'y')}) // 1024 AS bucket FROM pts
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(x) AS BIGINT) AS min_x, CAST(MAX(x) AS BIGINT) AS max_x,
           CAST(MIN(y) AS BIGINT) AS min_y, CAST(MAX(y) AS BIGINT) AS max_y,
           CAST((MAX(x) - MIN(x) + 1) * (MAX(y) - MIN(y) + 1) AS BIGINT)
             AS bbox_cells
    FROM z GROUP BY bucket ORDER BY bucket
    """,
)
def sink_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER clustered layout (the Delta/Iceberg OPTIMIZE ZORDER
    primitive, built from scratch): interleave the bits of two filter
    dimensions into a Morton value, bucket rows by Z-range, physically
    WRITE one file per bucket, and read the layout back to emit each
    bucket's (min, max) bounding box — the footer statistics data
    skipping consumes.

    Why it matters at 100 TB: a layout sorted on x alone skips nothing
    for y-predicates; the Z-curve bounds BOTH dimensions per file
    (bbox_cells ≤ 4·1024 here vs 256·256 for a random 1024-row bucket),
    so a 2-D predicate prunes ~·100× more files.  The bbox areas in the
    OUTPUT are the locality proof, hash-pinned cross-engine.

    Buckets are CLOSED-FORM (zvalue DIV 1024), never sampled range
    boundaries — reproducible at any SF and engine, unlike
    repartitionByRange's sampled splits (the production write swaps in
    range partitioning on the same zvalue; the stats contract is
    identical).  The write is partitionBy(bucket) — one directory per
    Z-range, the sink_partitioned pruning mechanism on the CLUSTERED
    key."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    pts = ev.select(
        (F.col("user_id") % 256).alias("x"),
        (F.round(F.col("value") * 100).cast("bigint") % 256).alias("y"),
    )
    z = pts.select(
        "x", "y", F.expr(f"({_z_interleave('x', 'y')}) DIV 1024").alias("bucket")
    )
    path = _sink_path("ks_spark_sink_zorder", sf_dir)
    # r16: hash-repartition on the bucket key before the partitioned write —
    # the single-row-group fixture scan otherwise writes all ~64 bucket
    # directories from ONE task.  Keyed on bucket, each bucket still lands
    # in exactly one task, preserving the one-file-per-bucket layout claim
    # while the write fans out across cores.
    z = spread(z, key="bucket")
    z.write.mode("overwrite").partitionBy("bucket").parquet(path)
    back = spark.read.parquet(path)
    return (
        back.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("x").cast("long").alias("min_x"),
            F.max("x").cast("long").alias("max_x"),
            F.min("y").cast("long").alias("min_y"),
            F.max("y").cast("long").alias("max_y"),
        )
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            "n_rows",
            "min_x",
            "max_x",
            "min_y",
            "max_y",
            (
                (F.col("max_x") - F.col("min_x") + 1)
                * (F.col("max_y") - F.col("min_y") + 1)
            ).alias("bbox_cells"),
        )
        .orderBy("bucket")
    )


@query(
    "source_corrupt_records",
    oracle="""
    SELECT CAST(COUNT(CASE WHEN doc_id % 7 <> 3 THEN 1 END) AS BIGINT)
             AS n_good,
           CAST(COUNT(CASE WHEN doc_id % 7 = 3 THEN 1 END) AS BIGINT)
             AS n_corrupt,
           bit_xor(CASE WHEN doc_id % 7 <> 3
                        THEN CAST('0x' || substr(md5(text), 1, 15) AS BIGINT)
                        ELSE 0 END) AS good_text_xor,
           CAST(SUM(CASE WHEN doc_id % 7 = 3 THEN 7 ELSE 0 END) AS BIGINT)
             AS corrupt_line_bytes
    FROM documents
    """,
)
def source_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record handling (PERMISSIVE mode +
    ``columnNameOfCorruptRecord``) — what actually happens when 100 TB
    of third-party JSONL contains broken lines: every 7th document's
    JSON line is deterministically corrupted (truncated to its first 7
    bytes — an unclosed object), the read-back must route EXACTLY those lines into
    the corrupt-record column with data fields NULL, and every clean
    line must survive byte-exactly (xor of the portable text hash).

    The oracle computes the expected split in closed form from the
    original parquet — a dropped corrupt line (FAILFAST would throw,
    DROPMALFORMED would silently delete), a good line misrouted, or
    any text mutation breaks the hash.  PERMISSIVE is the only mode
    that preserves the evidence for quarantine-and-reprocess, which is
    why it is the production default.

    Scale: corruption detection is per-line in the JSON parser —
    map-side, no extra pass; the quarantine split is one tiny
    aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    line = F.to_json(F.struct("doc_id", "text"))
    corrupted = F.when(
        F.col("doc_id") % 7 == 3,
        F.expr("substring(to_json(struct(doc_id, text)), 1, 7)"),
    ).otherwise(line)
    path = _sink_path("ks_spark_corrupt_src", sf_dir)
    docs.select(corrupted.alias("value")).write.mode("overwrite").text(path)
    back = (
        spark.read.schema("doc_id long, text string, _bad string")
        .option("columnNameOfCorruptRecord", "_bad")
        .option("mode", "PERMISSIVE")
        .json(path)
    )
    is_corrupt = F.col("_bad").isNotNull()
    return back.agg(
        F.sum((~is_corrupt).cast("int")).cast("long").alias("n_good"),
        F.sum(is_corrupt.cast("int")).cast("long").alias("n_corrupt"),
        F.expr(
            "bit_xor(CASE WHEN _bad IS NULL THEN"
            " CAST(conv(substr(md5(text), 1, 15), 16, 10) AS BIGINT)"
            " ELSE 0 END)"
        ).alias("good_text_xor"),
        F.sum(F.when(is_corrupt, F.length("_bad")).otherwise(F.lit(0)))
        .cast("long")
        .alias("corrupt_line_bytes"),
    )


@query(
    "scan_cache",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def scan_cache(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cache surface (``df.cache()`` → InMemoryRelation): a filtered
    projection is cached, materialized once, and the returned aggregate
    reads THROUGH the columnar cache (InMemoryTableScan in the plan) —
    the interactive-notebook and iterative-algorithm workhorse.

    The oracle recomputes from the raw parquet, so the hash pins cache
    TRANSPARENCY: serialization to the columnar cache format and back
    must change no value (cents stay exact ints through it).  The
    aggregate is materialized through the cache and the cache is then
    UNPERSISTED before returning (ADVICE r9: leaving the
    InMemoryRelation resident for the rest of the shared session added
    storage-memory pressure that could skew every key benchmarked
    after it); the returned frame is the materialized result, so no
    re-scan happens at the driver's collect.

    Scale: caching a 100 TB scan is a cluster-memory budget decision —
    the cached unit here is the FILTERED projection (status F, 4
    columns), the narrow intermediate you actually pin in practice,
    never the raw table."""
    o, agg = _scan_cache_agg(spark, sf_dir)
    o.count()  # materialize the cache before the read-through
    rows = agg.collect()  # read THROUGH the columnar cache
    schema = agg.schema
    o.unpersist()
    return spark.createDataFrame(rows, schema)


def _scan_cache_agg(spark: SparkSession, sf_dir: str):
    """(cached projection, through-cache aggregate) — split out so the
    plan test can assert InMemoryTableScan on the aggregate's plan
    before scan_cache materializes and unpersists it."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")
        .cache()
    )
    agg = (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("long")
            .alias("cents"),
            F.countDistinct("o_custkey").cast("long").alias("n_custs"),
        )
        .orderBy("o_orderpriority")
    )
    return o, agg
