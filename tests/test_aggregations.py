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
