"""Smoke tests: every registered query runs at sf0.001 and returns rows
with a stable schema; registry invariants hold (SURVEY.md §5.2 layer 2)."""

from __future__ import annotations

import pytest

from kafkastreaming_spark.all import ORACLES, QUERIES


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


def test_entry_contract(spark):
    import __spark_entry__ as e

    assert set(e.oracle_sql()) <= set(e.queries())
    df = e.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("key", sorted(QUERIES))
def test_query_runs(spark, sf_dir, key):
    df = QUERIES[key](spark, sf_dir)
    rows = df.count()
    assert rows >= 0
    assert len(df.columns) > 0
    # column names must be stable + lowercase-ish identifiers for the hash
    assert len(set(df.columns)) == len(df.columns), "duplicate column names"
