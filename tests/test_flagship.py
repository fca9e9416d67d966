"""Value-level spot checks for the flagship query at sf0.001."""

from __future__ import annotations

from kafkastreaming_spark.all import QUERIES


def test_agg_group_values(spark, sf_dir):
    rows = {
        (r["l_returnflag"], r["l_linestatus"]): r
        for r in QUERIES["agg_group"](spark, sf_dir).collect()
    }
    # 6000 lineitem rows at sf0.001, ~98% ship before the 2001-09-02 cutoff
    assert sum(r["count_order"] for r in rows.values()) > 5000
    for r in rows.values():
        assert r["sum_qty"] > 0
        assert 0.0 <= r["avg_disc"] <= 0.11
        assert abs(r["avg_qty"] * r["count_order"] - r["sum_qty"]) < 1.0
