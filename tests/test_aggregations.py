"""Aggregation-operator properties not covered by the oracle comparison —
accuracy envelopes for the approximate/rows-only keys."""

from __future__ import annotations

import pyspark.sql.functions as F

from kafkastreaming_spark.all import QUERIES
from kafkastreaming_spark.io import load_table


def test_sketch_partial_within_5pct_of_exact(spark, sf_dir):
    """agg_sketch_partial (r10: envelope-oracled) — the query itself now
    emits the ±5% merge accuracy as a boolean next to the exact counts;
    pin that every boolean is TRUE (so the driver hash-match holds by
    construction), the exact side agrees with an independent
    countDistinct, and the daily→total merge really re-aggregates
    (n_days > 1)."""
    rows = {
        r["event_type"]: r
        for r in QUERIES["agg_sketch_partial"](spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(rows) == set(exact)
    for etype, r in rows.items():
        assert r["n_days"] > 1
        assert r["merge_within_5pct"] is True, (etype, r)
        assert r["exact_users"] == exact[etype]


def test_linreg_degenerate_group_yields_null_both_engines(spark, tmp_path):
    """A group whose events all land in ONE hour bucket has zero x-variance:
    the nullif-guarded slope must be NULL (not Inf/NaN) in Spark AND in the
    DuckDB oracle, so the driver's stringified hash stays aligned
    (ADVICE r5: unguarded denominator)."""
    import datetime
    import os

    import duckdb
    import pyspark.sql.types as T

    from kafkastreaming_spark.all import ORACLES

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    t0 = datetime.datetime(2024, 3, 1, 12, 0, 5)
    rows = [(i, t0, 1, "degen", float(i), "{}") for i in range(4)]
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "events.parquet")
    )

    out = QUERIES["agg_linreg"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0]["slope_per_day"] is None
    assert out[0]["intercept"] is None

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    odf = con.execute(ORACLES["agg_linreg"]).df()
    assert len(odf) == 1
    import pandas as pd

    assert pd.isna(odf["slope_per_day"].iloc[0])
    assert pd.isna(odf["intercept"].iloc[0])


def test_approx_percentile_within_exact_bracket(spark, sf_dir):
    """GK sketch pin (r10: envelope-oracled) — the query now computes
    the [p-0.02, p+0.02] bracket check itself and emits one boolean per
    quartile; pin that every boolean is TRUE on the fixtures so the
    driver's hash-match against the literal-TRUE oracle holds by
    construction."""
    from kafkastreaming_spark.all import QUERIES
    from kafkastreaming_spark.io import load_table

    rows = QUERIES["agg_approx_percentile"](spark, sf_dir).collect()
    n_total = (
        load_table(spark, sf_dir, "events").groupBy("event_type").count().count()
    )
    assert len(rows) == n_total
    for r in rows:
        for col in ("q25_in_bracket", "q50_in_bracket", "q75_in_bracket"):
            assert r[col] is True, (r["event_type"], col, r)
        assert r["n_events"] > 0


def test_hll_union_within_error_envelope(spark, sf_dir):
    """agg_hll_union (r10: envelope-oracled) — the query emits the ±5%
    envelope boolean per row; pin every boolean TRUE and that the
    '<union>' row carries the global exact count.  Merge consistency
    (union ≤ sum of parts, ≥ max part) is pinned here independently of
    the query output by recomputing the raw estimates with the same
    DataSketches expressions."""
    from kafkastreaming_spark.all import QUERIES
    from kafkastreaming_spark.io import load_table
    from pyspark.sql import functions as F

    rows = {r["event_type"]: r for r in QUERIES["agg_hll_union"](spark, sf_dir).collect()}
    union_row = rows.pop("<union>")
    for et, r in rows.items():
        assert r["est_within_5pct"] is True, (et, r)
    assert union_row["est_within_5pct"] is True, union_row
    ev = load_table(spark, sf_dir, "events")
    exact_union = ev.agg(F.countDistinct("user_id").alias("n")).collect()[0]["n"]
    assert union_row["n_exact"] == exact_union

    per = ev.groupBy("event_type").agg(
        F.expr("hll_sketch_agg(user_id, 12)").alias("sk")
    )
    ests = {
        r["event_type"]: r["e"]
        for r in per.select(
            "event_type",
            F.expr("CAST(hll_sketch_estimate(sk) AS BIGINT)").alias("e"),
        ).collect()
    }
    union_est = per.agg(
        F.expr("CAST(hll_sketch_estimate(hll_union_agg(sk, true)) AS BIGINT)")
        .alias("e")
    ).collect()[0]["e"]
    assert union_est >= max(ests.values()) * 0.95
    assert union_est <= sum(ests.values())
