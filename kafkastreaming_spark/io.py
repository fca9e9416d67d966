"""Table loaders over the driver-generated parquet fixtures.

All queries load inputs through :func:`load_table` so that:

* the events timestamp shim is applied exactly once, at load
  (SURVEY.md §7.5): whatever physical encoding the fixture uses (int64
  nanos, TIMESTAMP_NTZ micros, or plain TIMESTAMP), downstream operators
  always see a session-UTC TIMESTAMP ``ts`` column.
* column pruning / predicate pushdown stay available — we return the raw
  ``spark.read.parquet`` DataFrame untouched for every other table, so
  Catalyst pushes filters and projections into the scan.

At 100 TB the same function signature holds; only the path changes to a
partitioned directory layout (e.g. ``events/date=.../``), which activates
partition pruning on top of row-group pushdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafkastreaming_spark.session import prepare

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# DuckDB oracle-side CTE for the events view: normalize TIMESTAMP_NS to
# microseconds so both engines see identical timestamps (SURVEY.md §5.4).
EVENTS_ORACLE_CTE = (
    # `main.events` avoids DuckDB 1.0.0's circular-CTE error when the CTE
    # shadows the pre-registered view of the same name.
    "events AS (SELECT event_id, "
    "CAST(date_trunc('microsecond', ts) AS TIMESTAMP) AS ts, "
    "user_id, event_type, value, props FROM main.events)"
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table; events gets a schema-adaptive ts shim.

    The fixture generator has shipped ``events.ts`` as both TIMESTAMP(NANOS)
    (read as int64 via nanosAsLong) and plain TIMESTAMP(MICROS) (read as
    TIMESTAMP_NTZ under Spark 4's inferTimestampNTZ) across rounds, so we
    dispatch on the actual scan schema instead of assuming one encoding.
    Either way downstream operators see a session-UTC TIMESTAMP column.
    """
    prepare(spark)
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    df = spark.read.parquet(path)
    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            # int64 nanoseconds: integer `div` keeps exact microseconds;
            # timestamp_micros is UTC-pinned.
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif isinstance(ts_type, T.TimestampNTZType):
            # tz-naive micros: session tz is pinned UTC, so this cast is a
            # pure type relabel (no wall-clock shift).
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
