"""Cross-dialect check (SURVEY.md §5.2 layer 4): representative DF-API
queries re-spelled as ``spark.sql`` over temp views must produce identical
results — guards against API-vs-SQL semantic drift inside Spark itself,
upstream of the DuckDB comparison."""

from __future__ import annotations

import pytest
from pyspark.sql import DataFrame

from kafkastreaming_spark.all import QUERIES
from kafkastreaming_spark.io import TABLES, load_table

# key → equivalent Spark-SQL spelling (Spark dialect, not DuckDB)
SQL_TWINS = {
    "agg_group": """
        SELECT l_returnflag, l_linestatus,
               CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(24,8))), 2) AS DOUBLE) AS sum_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "join_semi": """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders
                            WHERE o_orderstatus = 'F')
    """,
    "join_anti": """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                WHERE o_orderpriority = '1-URGENT')
    """,
    "topk_global": """
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    "win_topk_group": """
        SELECT * FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders) WHERE rn <= 3
    """,
    "set_union": """
        SELECT user_id FROM events WHERE event_type = 'click'
        UNION
        SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    "llm_exact_dedup": """
        SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_doc_id,
               COUNT(*) AS n_copies
        FROM documents GROUP BY md5(text)
    """,
    "stream_tumbling": """
        SELECT window.start AS window_start, window.end AS window_end,
               event_type, COUNT(*) AS n_events,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(24,8))), 2) AS DOUBLE) AS sum_value
        FROM (SELECT * FROM events)
        GROUP BY window(ts, '5 minutes'), event_type
    """,
}


def _canon(df: DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


@pytest.fixture(scope="module", autouse=True)
def _views(spark, sf_dir):
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


@pytest.mark.parametrize("key", sorted(SQL_TWINS))
def test_sql_twin_matches_df_api(spark, sf_dir, key):
    df_out = QUERIES[key](spark, sf_dir)
    sql_out = spark.sql(SQL_TWINS[key])
    # twin may project a subset of the DF query's columns
    df_out = df_out.select(*[c for c in sql_out.columns])
    assert _canon(df_out) == _canon(sql_out)
