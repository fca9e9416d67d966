"""Array, explode, higher-order, JSON, and map bundles
(SURVEY.md §2.8 fn_array / fn_explode / fn_higher_order / fn_json / fn_map).

Design rule: hash-checked outputs are always SCALAR columns — array-typed
results are reduced (size / element / aggregated sum / joined string)
because the two clients materialize list values differently in pandas.

Float→decimal sums follow functions/numeric.py: per-element cast to
DECIMAL via double, exact sum, round — order-independent and identical
across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreaming_spark.io import EVENTS_ORACLE_CTE, load_table, spread
from kafkastreaming_spark.registry import query


@query(
    "fn_array",
    oracle="""
    SELECT vec_id, label,
           CAST(length(embedding) AS INTEGER) AS n_dims,
           CAST(embedding[5] AS DOUBLE) AS dim5,
           CAST(list_contains(embedding, embedding[1]) AS BOOLEAN) AS has_first,
           CAST(list_sort(embedding)[1] AS DOUBLE) AS min_val,
           CAST(list_sort(embedding)[-1] AS DOUBLE) AS max_val,
           CAST(length(list_distinct(embedding)) AS INTEGER) AS n_distinct,
           (SELECT CAST(ROUND(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(24,8))), 6)
                        AS DOUBLE)
            FROM unnest(embedding[1:8]) AS t(x)) AS head_sum
    FROM embeddings
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size/element_at/array_contains/array_min/array_max/array_distinct/
    slice — reduced to scalars."""
    e = load_table(spark, sf_dir, "embeddings")
    head_sum = F.aggregate(
        F.slice("embedding", 1, 8),
        F.lit(0).cast("decimal(24,8)"),
        lambda acc, x: (acc + x.cast("double").cast("decimal(24,8)")).cast(
            "decimal(24,8)"
        ),
    )
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").alias("n_dims"),
        F.element_at("embedding", 5).cast("double").alias("dim5"),
        F.array_contains("embedding", F.element_at("embedding", 1)).alias("has_first"),
        F.array_min("embedding").cast("double").alias("min_val"),
        F.array_max("embedding").cast("double").alias("max_val"),
        F.size(F.array_distinct("embedding")).alias("n_distinct"),
        F.round(head_sum, 6).cast("double").alias("head_sum"),
    )


@query(
    "fn_explode",
    oracle="""
    SELECT vec_id, CAST(i - 1 AS INTEGER) AS pos,
           CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) AS val
    FROM embeddings, range(1, 9) t(i)
    """,
)
def fn_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode of the first 8 dimensions → (vec_id, pos, val) rows."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id", F.posexplode(F.slice("embedding", 1, 8)).alias("pos", "valf")
    ).select("vec_id", "pos", F.col("valf").cast("double").alias("val"))


@query(
    "fn_higher_order",
    oracle="""
    SELECT vec_id,
           CAST(length(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_positive,
           (SELECT CAST(ROUND(SUM(CAST(CAST(x AS DOUBLE) * 2 AS DECIMAL(24,8))), 6)
                        AS DOUBLE)
            FROM unnest(embedding) AS t(x)) AS doubled_sum,
           ROUND(CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE), 6) AS max_abs
    FROM embeddings
    """,
)
def fn_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lambda ops: filter(x>0) count, transform(x*2)+aggregate sum, max(abs).

    All evaluated inside codegen'd HigherOrderFunction expressions — no
    Python boundary, fully vectorizable at 100 TB."""
    e = load_table(spark, sf_dir, "embeddings")
    doubled_sum = F.aggregate(
        "embedding",
        F.lit(0).cast("decimal(24,8)"),
        lambda acc, x: (acc + (x.cast("double") * 2).cast("decimal(24,8)")).cast(
            "decimal(24,8)"
        ),
    )
    return e.select(
        "vec_id",
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
        F.round(doubled_sum, 6).cast("double").alias("doubled_sum"),
        F.round(
            F.array_max(F.transform("embedding", lambda x: F.abs(x))).cast("double"), 6
        ).alias("max_abs"),
    )


@query(
    "fn_json",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE}
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k_val,
           CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS k_missing,
           '{{"k":' || CAST(json_extract(props, '$.k') AS VARCHAR) || '}}'
             AS rebuilt_json
    FROM events
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object / from_json → struct / to_json round trip."""
    ev = spread(load_table(spark, sf_dir, "events"), key="event_id")
    parsed = F.from_json("props", "k INT")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_val"),
        F.get_json_object("props", "$.missing").alias("k_missing"),
        F.to_json(parsed).alias("rebuilt_json"),
    )


@query(
    "fn_map",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE}
    SELECT event_id,
           'k' AS map_keys_joined,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_element,
           1 AS map_size
    FROM events
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json → MapType, map_keys/map_values/element_at/size.

    The oracle side has no MAP type over JSON, so the map outputs are
    reduced to scalars: joined key list, the 'k' value, and entry count.
    """
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return ev.select(
        "event_id",
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("map_keys_joined"),
        F.element_at(m, "k").alias("k_element"),
        F.size(m).alias("map_size"),
    )


@query(
    "fn_struct",
    oracle="""
    WITH s AS (
      SELECT o_orderkey,
             struct_pack(d := o_orderdate, p := o_totalprice) AS os
      FROM orders WHERE o_orderkey % 100 = 0
    )
    SELECT o_orderkey,
           os.d AS order_date,
           os.p AS order_price,
           CASE WHEN os.p > 200000 THEN 'big' ELSE 'small' END AS bucket
    FROM s
    """,
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRUCT round trip: pack columns into a nested struct, project
    fields back out, and branch on a field — the nested-type surface
    (parquet groups, JSON objects) beyond arrays/maps.  Struct columns
    themselves are not driver-hashable, so the registered output is the
    unpacked scalar projection; the struct exists mid-plan, and Catalyst
    collapses the pack/unpack round trip to a no-op projection (zero
    serialization cost — nested types are columnar all the way down in
    both parquet and Tungsten)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.expr("o_orderkey % 100 = 0")
    )
    s = orders.select(
        "o_orderkey",
        F.struct(
            F.col("o_orderdate").alias("d"), F.col("o_totalprice").alias("p")
        ).alias("os"),
    )
    return s.select(
        "o_orderkey",
        F.col("os.d").alias("order_date"),
        F.col("os.p").alias("order_price"),
        F.when(F.col("os.p") > 200000, "big").otherwise("small").alias("bucket"),
    )
