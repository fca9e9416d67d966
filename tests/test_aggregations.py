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


def test_events_survival_conservation_and_monotone(spark, sf_dir):
    """KM life table invariants: Σ(events+censored) = #users; at-risk is
    the reverse cumsum (strictly decreasing in ascending duration as
    buckets drain); hazard ∈ [0,1]; the first bucket's at-risk equals
    the full user population."""
    from kafkastreaming_spark.all import QUERIES as Q
    from kafkastreaming_spark.io import load_table

    rows = sorted(
        Q["events_survival"](spark, sf_dir).collect(),
        key=lambda r: r["duration_h"],
    )
    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert sum(r["n_events"] + r["n_censored"] for r in rows) == n_users
    assert rows[0]["n_at_risk"] == n_users
    prev = None
    for r in rows:
        assert 0.0 <= r["hazard"] <= 1.0
        assert r["n_events"] + r["n_censored"] >= 1  # no empty buckets
        if prev is not None:
            assert r["n_at_risk"] == prev["n_at_risk"] - (
                prev["n_events"] + prev["n_censored"]
            )
        prev = r
    assert prev["n_at_risk"] == prev["n_events"] + prev["n_censored"]


def test_events_ks_test_matches_numpy_rebuild(spark, sf_dir):
    """KS statistic cross-checked against a direct numpy empirical-CDF
    rebuild on the same cents grid, including the argmax location and
    the integer-arithmetic 5% decision."""
    import numpy as np

    from kafkastreaming_spark.all import QUERIES as Q
    from kafkastreaming_spark.io import load_table

    row = Q["events_ks_test"](spark, sf_dir).collect()[0]
    ev = (
        load_table(spark, sf_dir, "events")
        .filter("event_type in ('click','purchase')")
        .select("event_type", "value")
        .toPandas()
    )
    cents = np.round(ev["value"].to_numpy() * 100).astype(np.int64)
    is_a = (ev["event_type"] == "click").to_numpy()
    a, b = np.sort(cents[is_a]), np.sort(cents[~is_a])
    n1, n2 = len(a), len(b)
    grid = np.unique(cents)
    ca = np.searchsorted(a, grid, side="right").astype(np.int64)
    cb = np.searchsorted(b, grid, side="right").astype(np.int64)
    dnum = np.abs(ca * n2 - cb * n1)
    k = int(np.flatnonzero(dnum == dnum.max())[0])  # min-cents tie-break
    assert (row["n_click"], row["n_purchase"]) == (n1, n2)
    assert row["d_num"] == int(dnum.max())
    assert row["ks_location_cents"] == int(grid[k])
    assert row["d_stat"] == round(int(dnum.max()) * 1e6 / (n1 * n2)) / 1e6
    assert row["reject_5pct"] == bool(
        int(dnum.max()) ** 2 * 1_000_000 > 1_844_164 * n1 * n2 * (n1 + n2)
    )


def test_ts_sax_quartile_symbols_and_conservation(spark, sf_dir):
    """SAX invariants: symbols ∈ {0..3}; Σ n_rows over the grid equals
    the raw event count; per series each quartile bucket holds between
    ⌊m/4⌋−1 and ⌈m/4⌉+1 frames up to ties (empirical quartile cuts at
    exact integer breakpoints can only shift counts by tied values);
    symbol is monotone in sum_cents within a series."""
    from collections import defaultdict

    from kafkastreaming_spark.all import QUERIES as Q
    from kafkastreaming_spark.io import load_table

    rows = Q["ts_sax"](spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "events").count()
    assert sum(r["n_rows"] for r in rows) == total
    per = defaultdict(list)
    for r in rows:
        assert 0 <= r["symbol"] <= 3
        per[r["event_type"]].append((r["sum_cents"], r["symbol"]))
    for series in per.values():
        series.sort()
        # monotone: sorting by sum_cents must sort symbols too
        syms = [s for _, s in series]
        assert syms == sorted(syms)
        m = len(series)
        # the three breakpoints split the sorted frames near quarters;
        # ties can only GROW a lower bucket past its quarter, so the
        # cumulative counts at symbols <=0/<=1/<=2 are at least the
        # type-1 positions
        import math

        cum = [0] * 4
        for s in syms:
            cum[s] += 1
        assert cum[0] >= math.ceil(m / 4) - (m - len({c for c, _ in series}))
        assert sum(cum) == m
