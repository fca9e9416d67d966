"""bench.py round-stamping logic (judge r5 item 5 / ADVICE partial-run
flag): the round inference must track the driver's BENCH_r{N}.json trail
and honor the env override."""

from __future__ import annotations

import importlib
import os


def test_current_round_is_max_bench_plus_one(monkeypatch):
    import bench

    monkeypatch.delenv("SPARK_GRAFT_ROUND", raising=False)
    # repo currently holds BENCH_r01..r05 → in-progress round is 6+
    assert bench.current_round() >= 6


def test_current_round_env_override(monkeypatch):
    import bench

    monkeypatch.setenv("SPARK_GRAFT_ROUND", "42")
    assert bench.current_round() == 42
