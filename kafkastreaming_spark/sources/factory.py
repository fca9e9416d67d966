"""Streaming source factory (SURVEY.md §2.1 source_kafka, §7.1 M4).

Production path: Kafka via Structured Streaming's native connector —
``readStream.format("kafka")`` with JSON payload parsing.  This sandbox has
no kafka connector jar and no network (SURVEY.md §7.5), so the factory
also provides a file-replay source with the *same output schema*; every
streaming query in this engine is written against the factory, so the
identical query runs on either source.

Kafka design notes (the options a 100 TB deployment sets):

* ``maxOffsetsPerTrigger`` — bound micro-batch size so state updates and
  sink writes stay executor-sized.
* ``minPartitions`` — split hot Kafka partitions across more tasks.
* ``startingOffsets=earliest`` + checkpointing → exactly-once replay.
* value is JSON: parse with ``from_json`` against an explicit schema —
  never schema inference on a stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def kafka_event_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = "events",
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = 1_000_000,
) -> DataFrame:
    """Events from Kafka: JSON values parsed to the canonical event schema.

    Runs only where the spark-sql-kafka connector is on the classpath
    (not in this sandbox — SURVEY.md §7.5); the file-replay source below
    is the locally-testable twin with the same schema.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    raw = reader.load()
    payload = T.StructType(
        [f for f in EVENT_SCHEMA.fields if f.name != "ts"]
        + [T.StructField("ts_ns", T.LongType())]
    )
    return (
        raw.select(F.from_json(F.col("value").cast("string"), payload).alias("e"))
        .select("e.*")
        .withColumn("ts", F.timestamp_micros(F.expr("ts_ns div 1000")))
        .drop("ts_ns")
        .select([f.name for f in EVENT_SCHEMA.fields])
    )


def file_event_stream(
    spark: SparkSession, chunk_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-replay source: reads pre-chunked parquet as an unbounded stream,
    one chunk per micro-batch — the local stand-in for the Kafka source."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(chunk_dir)
    )
