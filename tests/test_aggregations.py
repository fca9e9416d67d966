"""Aggregation-operator properties not covered by the oracle comparison —
accuracy envelopes for the approximate/rows-only keys."""

from __future__ import annotations

import pyspark.sql.functions as F

from kafkastreaming_spark.all import QUERIES
from kafkastreaming_spark.io import load_table


def test_sketch_partial_within_5pct_of_exact(spark, sf_dir):
    """agg_sketch_partial is rows-only for the driver; pin its accuracy
    envelope (HLL lgK=14 on ≤60k users: well under ±5%) and that the
    daily→total merge really re-aggregates (n_days > 1)."""
    est = {
        r["event_type"]: (r["est_users"], r["n_days"])
        for r in QUERIES["agg_sketch_partial"](spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for etype, (e, n_days) in est.items():
        assert n_days > 1
        assert abs(e - exact[etype]) <= 0.05 * exact[etype], (etype, e, exact[etype])


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
    """GK sketch pin: every approximate quartile must land inside the
    exact [p-0.02, p+0.02] quantile bracket of its group (rank error
    <= n/10_000 guaranteed; bracket gives 10x margin)."""
    from pyspark.sql import functions as F

    from kafkastreaming_spark.all import QUERIES
    from kafkastreaming_spark.io import load_table

    approx = {
        r["event_type"]: [r["q25"], r["q50"], r["q75"]]
        for r in QUERIES["agg_approx_percentile"](spark, sf_dir).collect()
    }
    brackets = {
        r["event_type"]: (r["lo"], r["hi"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.expr(
                "percentile(value, array(0.23, 0.48, 0.73))"
            ).alias("lo"),
            F.expr(
                "percentile(value, array(0.27, 0.52, 0.77))"
            ).alias("hi"),
        )
        .collect()
    }
    assert set(approx) == set(brackets)
    for et, qs in approx.items():
        lo, hi = brackets[et]
        for q, lo_q, hi_q in zip(qs, lo, hi):
            assert lo_q <= q <= hi_q, (et, q, lo_q, hi_q)


def test_hll_union_within_error_envelope(spark, sf_dir):
    """agg_hll_union: every per-type DataSketches estimate and the
    merged union estimate must land within the lgK=12 HLL relative
    error envelope (~1.6% at 3 sigma -> use 5% margin) of the exact
    distinct counts; union must be bounded by max-part and sum-parts."""
    from kafkastreaming_spark.all import QUERIES
    from kafkastreaming_spark.io import load_table
    from pyspark.sql import functions as F

    rows = {r["event_type"]: r for r in QUERIES["agg_hll_union"](spark, sf_dir).collect()}
    union_row = rows.pop("<union>")
    for et, r in rows.items():
        assert abs(r["n_est"] - r["n_exact"]) <= max(2, 0.05 * r["n_exact"]), (et, r)
    exact_union = (
        load_table(spark, sf_dir, "events")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()[0]["n"]
    )
    est = union_row["n_est"]
    assert abs(est - exact_union) <= max(2, 0.05 * exact_union), (est, exact_union)
    assert est >= max(r["n_est"] for r in rows.values()) * 0.95
    assert est <= sum(r["n_est"] for r in rows.values())
