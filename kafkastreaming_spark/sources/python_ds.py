"""Custom connector via the Python DataSource API (Spark 4, SPIP
SPARK-44076) — the extension point a user reaches for when the source
isn't one of the built-in formats: internal REST feeds, proprietary
binary logs, synthetic load generators.  ``ks_sensor`` is a
deterministic sensor-log generator: every (sensor, reading) cell is a
pure integer function of its coordinates, so the scan is reproducible,
partition-order-free, and hash-checkable against a closed-form SQL
oracle — the same discipline as every other source key.

Scale shape: ``partitions()`` splits the sensor space into 8 input
partitions (one Python worker each, Arrow-batched back to the JVM); a
real connector would map partitions to Kafka topic-partitions / file
splits / shard ranges exactly the same way, which is what makes the
API cluster-parallel rather than a driver-side iterator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from kafkastreaming_spark.registry import query

_N_SENSORS = 64
_N_READINGS = 1000
_N_PARTS = 8


class _SensorPartition(InputPartition):
    def __init__(self, part_id: int):
        self.part_id = part_id


class _SensorReader(DataSourceReader):
    def __init__(self, options):
        self.n_sensors = int(options.get("n_sensors", _N_SENSORS))
        self.n_readings = int(options.get("n_readings", _N_READINGS))

    def partitions(self):
        return [_SensorPartition(i) for i in range(_N_PARTS)]

    def read(self, partition):
        # each partition owns the sensors congruent to its id mod
        # _N_PARTS — a shard-range split, the way a real connector
        # would map Kafka partitions or file splits
        for sensor_id in range(partition.part_id, self.n_sensors, _N_PARTS):
            for reading_no in range(self.n_readings):
                yield (
                    sensor_id,
                    reading_no,
                    (sensor_id * 7919 + reading_no * 104729) % 40000 - 10000,
                )


class SensorDataSource(DataSource):
    """spark.read.format("ks_sensor") — deterministic integer sensor log."""

    @classmethod
    def name(cls):
        return "ks_sensor"

    def schema(self):
        return "sensor_id bigint, reading_no bigint, temp_milli bigint"

    def reader(self, schema):
        return _SensorReader(self.options)


@query(
    "source_python_ds",
    oracle=f"""
    WITH raw AS (
      SELECT s.sensor_id, r.reading_no,
             (s.sensor_id * 7919 + r.reading_no * 104729) % 40000 - 10000
               AS temp_milli
      FROM (SELECT unnest(generate_series(0, {_N_SENSORS - 1})) AS sensor_id) s,
           (SELECT unnest(generate_series(0, {_N_READINGS - 1})) AS reading_no) r
    )
    SELECT sensor_id,
           CAST(COUNT(*) AS BIGINT) AS n_readings,
           CAST(SUM(temp_milli) AS BIGINT) AS sum_temp_milli,
           MIN(temp_milli) AS min_temp_milli,
           MAX(temp_milli) AS max_temp_milli,
           CAST(SUM(CASE WHEN temp_milli > 20000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hot
    FROM raw GROUP BY sensor_id
    """,
)
def source_python_ds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read through the registered Python DataSource and reduce to a
    per-sensor health summary — count / exact milli-degree sum / range
    / hot-reading count.  All values are pure int64 closed forms of the
    row coordinates, so the oracle recomputes them from
    generate_series without ever seeing the connector.  The sf_dir is
    deliberately unused: the key checks the CONNECTOR surface, not a
    fixture table."""
    del sf_dir
    # idempotent: re-registering simply replaces the prior mapping
    spark.dataSource.register(SensorDataSource)
    raw = spark.read.format("ks_sensor").load()
    return raw.groupBy("sensor_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_readings"),
        F.sum("temp_milli").cast("long").alias("sum_temp_milli"),
        F.min("temp_milli").alias("min_temp_milli"),
        F.max("temp_milli").alias("max_temp_milli"),
        F.sum(F.when(F.col("temp_milli") > 20000, 1).otherwise(0))
        .cast("long")
        .alias("n_hot"),
    )
