"""UDF / UDAF / UDTF surface (SURVEY.md §2.10).

Demonstrates every Python-extension tier, slowest-to-fastest
(SURVEY.md §3.2c: the JVM↔Python Arrow boundary is the expensive one):

* ``udf_scalar`` — row-at-a-time Python UDF.  Deliberately the slow path;
  kept off every hot query.  At 100 TB this spelling is replaced by the
  built-in ``CASE WHEN`` (the oracle's spelling) — the key exists to pin
  UDF semantics, not as a recommendation.
* ``udf_pandas`` — Arrow-vectorized pandas UDF (one Python call per
  batch, NumPy math inside) — the acceptable Python path at scale.
* ``udaf_grouped`` — ``groupBy().applyInPandas`` grouped-map UDAF: whole
  groups as pandas DataFrames; shuffles by the grouping key, so group
  cardinality/skew governs scale behavior.
* ``udtf_tokens`` — Python UDTF (Spark ≥3.5) via SQL ``LATERAL`` join.

Determinism (SURVEY.md §5.4): every float that crosses a multi-order
summation is rounded to 6dp in BOTH engines; quantile bounds operate on
already-rounded norms so the inclusive IQR comparison can't straddle a
ULP (boundaries are either exact data points or ≥1e-6 away from the
rounded grid).
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf, udtf

from kafkastreaming_spark.io import EVENTS_ORACLE_CTE, load_table
from kafkastreaming_spark.registry import query

# Fixed 64-d query vector for udf_pandas: 6dp-rounded sines, so the SQL
# literal (repr) parses to the bit-identical double in both engines.
QUERY_VEC = [round(math.sin(i + 1), 6) for i in range(64)]
_QV_SQL = "[" + ", ".join(repr(v) for v in QUERY_VEC) + "]::DOUBLE[]"


@query(
    "udf_scalar",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE}
    SELECT event_id, value,
           CASE WHEN value < 10 THEN 'low'
                WHEN value < 100 THEN 'mid'
                ELSE 'high' END AS tier
    FROM events
    """,
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-wise Python UDF: value → tier label (oracle: plain CASE)."""

    @udf("string")
    def tier(v: float) -> str:
        if v < 10:
            return "low"
        if v < 100:
            return "mid"
        return "high"

    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", "value", tier("value").alias("tier"))


@query(
    "udf_pandas",
    oracle=f"""
    WITH e AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve,
             {_QV_SQL} AS qv
      FROM embeddings
    )
    SELECT vec_id,
           ROUND(list_dot_product(ve, qv)
                 / (sqrt(list_dot_product(ve, ve)) * sqrt(list_dot_product(qv, qv))),
                 6) AS cos_sim
    FROM e
    """,
)
def udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized pandas UDF: cosine similarity of every embedding
    to the fixed :data:`QUERY_VEC`, float64, rounded 6dp.

    One Arrow batch → one NumPy matmul; ~100× the row-UDF throughput.
    At 100 TB this is the pattern for any numeric kernel Spark lacks."""
    q = np.array(QUERY_VEC, dtype=np.float64)
    qn = math.sqrt(float(np.dot(q, q)))

    @pandas_udf("double")
    def cos_to_query(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy()).astype(np.float64)
        dots = m @ q
        norms = np.sqrt((m * m).sum(axis=1))
        return pd.Series(np.round(dots / (norms * qn), 6))

    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select("vec_id", cos_to_query("embedding").alias("cos_sim"))


_IQR_SCHEMA = "label int, n_in_iqr long, iqr_mean_norm double"


def _iqr_mean_norms(pdf: pd.DataFrame) -> pd.DataFrame:
    """Interquartile mean of 6dp-rounded L2 norms for one label group."""
    m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    norms = np.round(np.sqrt((m * m).sum(axis=1)), 6)
    q1, q3 = np.quantile(norms, [0.25, 0.75])
    sel = norms[(norms >= q1) & (norms <= q3)]
    return pd.DataFrame(
        {
            "label": [int(pdf["label"].iloc[0])],
            "n_in_iqr": [len(sel)],
            "iqr_mean_norm": [float(np.round(sel.mean(), 6))],
        }
    )


@query(
    "udaf_grouped",
    oracle="""
    WITH norms AS (
      SELECT label,
             ROUND(sqrt(list_dot_product(ve, ve)), 6) AS nrm
      FROM (SELECT label,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
            FROM embeddings)
    ),
    bounds AS (
      SELECT label,
             quantile_cont(nrm, 0.25) AS q1,
             quantile_cont(nrm, 0.75) AS q3
      FROM norms GROUP BY label
    )
    SELECT n.label,
           COUNT(*) AS n_in_iqr,
           ROUND(AVG(nrm), 6) AS iqr_mean_norm
    FROM norms n JOIN bounds b USING (label)
    WHERE nrm >= q1 AND nrm <= q3
    GROUP BY n.label
    """,
)
def udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map UDAF: per-label interquartile mean of vector norms via
    ``applyInPandas`` (oracle: quantile_cont-bounded AVG).

    Norms are rounded BEFORE the quantile so both engines filter the
    identical multiset.  Shuffles once on ``label`` (10 groups here; at
    100 TB a high-cardinality key keeps groups executor-sized)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.groupBy("label").applyInPandas(_iqr_mean_norms, _IQR_SCHEMA)


@udtf(returnType="doc_id bigint, token string, pos int")
class SplitTokens:
    """Python UDTF: text → one (doc_id, token, 1-based position) row per
    whitespace token (oracle: unnest + generate_subscripts)."""

    def eval(self, doc_id: int, text: str):
        for i, tok in enumerate(text.split(" ")):
            yield doc_id, tok, i + 1


@query(
    "udtf_tokens",
    oracle="""
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS token,
           generate_subscripts(string_split(text, ' '), 1) AS pos
    FROM documents
    """,
)
def udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-valued UDF via SQL LATERAL: tokenize every document."""
    spark.udtf.register("ks_split_tokens", SplitTokens)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("ks_udtf_docs")
    return spark.sql(
        """
        SELECT t.doc_id, t.token, t.pos
        FROM ks_udtf_docs d, LATERAL ks_split_tokens(d.doc_id, d.text) t
        """
    )


@query(
    "udf_pandas_iter",
    oracle=f"""
    WITH {EVENTS_ORACLE_CTE}
    SELECT event_id,
           CAST(ROUND(value * 100) AS BIGINT) AS cents,
           CASE WHEN CAST(ROUND(value * 100) AS BIGINT) % 97 < 32 THEN 'cold'
                WHEN CAST(ROUND(value * 100) AS BIGINT) % 97 < 65 THEN 'warm'
                ELSE 'hot' END AS shard_tier
    FROM events WHERE value IS NOT NULL
    """,
)
def udf_pandas_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator pandas UDF (``Iterator[pd.Series] → Iterator[pd.Series]``,
    SCALAR_ITER): the tier between udf_pandas and mapInPandas — one
    Python worker receives ALL of a partition's Arrow batches through a
    generator, so per-partition setup (model weights, tokenizer, GPU
    context) loads ONCE per task instead of once per batch.  Here the
    "model" is a 97-entry lookup table built before the first batch;
    production swaps in a real artifact load, and at 100 TB that
    amortization is the difference between loading a model 10⁶ times
    (per batch) and 10³ times (per task).

    The lookup maps exact cents mod 97 to a routing tier, so the oracle
    is a closed-form CASE — the hash pins that batch iteration neither
    drops, reorders within rows, nor double-processes a batch."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())

    @pandas_udf("string")
    def tier_of(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # per-task init: build the "model" once, before the first batch
        lut = np.array(
            ["cold"] * 32 + ["warm"] * 33 + ["hot"] * 32, dtype=object
        )
        for cents in batches:
            idx = (cents.to_numpy(dtype="int64") % 97).astype("int64")
            yield pd.Series(lut[idx])

    cents = F.round(F.col("value") * 100).cast("bigint")
    return ev.select(
        "event_id",
        cents.alias("cents"),
        tier_of(cents).alias("shard_tier"),
    )


class _MeltUDTF:
    """Polymorphic melt: first input column is the preserved key; every
    other column becomes one (col_name, col_value-as-string) row.  The
    output schema is COMPUTED by analyze() from the incoming TABLE
    argument's schema — the Spark 4 dynamic-schema UDTF contract."""

    @staticmethod
    def analyze(t):
        from pyspark.sql.types import StringType, StructType
        from pyspark.sql.udtf import AnalyzeResult

        st = t.dataType
        out = StructType()
        key = st.fields[0]
        out.add(key.name, key.dataType)
        out.add("col_name", StringType())
        out.add("col_value", StringType())
        return AnalyzeResult(schema=out)

    def eval(self, row):
        items = list(row.asDict().items())
        key = items[0][1]
        for name, val in items[1:]:
            yield (key, name, None if val is None else str(val))


@query(
    "udtf_analyze",
    oracle="""
    SELECT o_orderkey, 'o_orderstatus' AS col_name,
           CAST(o_orderstatus AS VARCHAR) AS col_value
    FROM orders WHERE o_orderstatus = 'P'
    UNION ALL
    SELECT o_orderkey, 'o_orderpriority',
           CAST(o_orderpriority AS VARCHAR)
    FROM orders WHERE o_orderstatus = 'P'
    """,
)
def udtf_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4): the output schema is not
    declared statically but computed by a static ``analyze()`` from the
    TABLE argument's own schema — the dynamic-schema contract that
    generic table transforms (melt/unpivot, JSON exploders, schema
    translators) need, and the §2.10 tier ``udtf_tokens``'s fixed
    ``returnType`` cannot express.  The demo melts a 3-column orders
    slice into (key, col_name, col_value) rows; the preserved key keeps
    the INPUT's name and type, proving the schema really came from
    analyze() (the oracle would schema-mismatch otherwise, since the
    driver compares sorted column names).

    Filter (status 'P', ~4% of orders) is pushed into the TABLE
    argument's scan, NOT applied after the fanout — with a UDTF the
    engine cannot push predicates through Python, so the query author
    must (the fn_xpath usage-contract discipline).  Row-at-a-time
    Python is the UDTF execution model by definition; bulk unpivot of
    fixed columns belongs to agg_unpivot (pure JVM stack())."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "ks_udtf_orders"
    )
    spark.udtf.register("ks_melt", udtf(_MeltUDTF))
    return spark.sql(
        """
        SELECT * FROM ks_melt(TABLE(
          SELECT o_orderkey, o_orderstatus, o_orderpriority
          FROM ks_udtf_orders WHERE o_orderstatus = 'P'
        ))
        """
    )
