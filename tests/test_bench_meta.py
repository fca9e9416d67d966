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


def test_current_round_mid_round_rerun(monkeypatch, tmp_path):
    """The r7 misfile bug: once this repo's own BENCH_DETAIL_r{N} exists
    mid-round, a second artifact run must still stamp N — only the
    driver's end-of-round BENCH_r{N} advances the inference."""
    import bench

    monkeypatch.delenv("SPARK_GRAFT_ROUND", raising=False)
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    (tmp_path / "BENCH_r06.json").write_text("{}")
    assert bench.current_round() == 7  # fresh round: driver trail + 1
    (tmp_path / "BENCH_DETAIL_r07.json").write_text("{}")
    assert bench.current_round() == 7  # mid-round re-run: NOT 8
    (tmp_path / "BENCH_r07.json").write_text("{}")
    assert bench.current_round() == 8  # driver closed round 7


def test_current_round_ambiguous_state_warns(monkeypatch, tmp_path, capsys):
    """Equal nonzero trails (driver dropped BENCH_rN early, or a fresh
    round start) are genuinely ambiguous (ADVICE r7): the inference must
    say so on stderr and assume the fresh-round reading."""
    import bench

    monkeypatch.delenv("SPARK_GRAFT_ROUND", raising=False)
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    (tmp_path / "BENCH_r07.json").write_text("{}")
    (tmp_path / "BENCH_DETAIL_r07.json").write_text("{}")
    assert bench.current_round() == 8
    assert "ambiguous" in capsys.readouterr().err


def test_harness_keys_consistent_with_registry():
    """bench.HARNESS_KEYS must be real registered+oracled keys, and the
    headline set must stay the 273-key BASELINE.md protocol inventory."""
    import bench
    from kafkastreaming_spark.all import ORACLES, QUERIES

    assert bench.HARNESS_KEYS <= set(QUERIES)
    assert bench.HARNESS_KEYS <= set(ORACLES)  # all hash-oracled since r10
    # 273-key r9 protocol set + the 2 engine keys added in r10
    # (agg_bitmap_native, source_binaryfile)
    assert len(set(ORACLES) - bench.HARNESS_KEYS) == 275
