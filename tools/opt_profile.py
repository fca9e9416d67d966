"""Per-key optimization profiler (r16).

For each requested key: one untimed warm noop run, N timed noop runs
(median reported), and the ``explain("formatted")`` physical plan written
to ``plans/r16/<key>_<tag>.txt`` — the before/after evidence the
optimization round commits next to OPTIMIZATION_r16.md.

Usage::

    python tools/opt_profile.py --tag before tpch_q1 agg_group
    python tools/opt_profile.py --tag after --repeats 5 tpch_q1

Timing methodology matches bench.py exactly (noop sink, warm run first,
median of repeats) so numbers here are directly comparable to
BENCH_DETAIL per-key entries.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--no-plan", action="store_true", help="skip writing the plan file")
    ap.add_argument(
        "--round-dir",
        default="r17",
        help="plans/<round-dir>/ to write the explain dumps into",
    )
    args = ap.parse_args()

    from kafkastreaming_spark.all import QUERIES
    from kafkastreaming_spark.session import get_session

    spark = get_session("opt_profile")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM/codegen path the same way bench.py does
    QUERIES["agg_group"](spark, args.sf_dir).count()

    plans_dir = os.path.join(REPO, "plans", args.round_dir)
    os.makedirs(plans_dir, exist_ok=True)

    out: dict[str, dict] = {}
    for key in args.keys:
        if key not in QUERIES:
            print(f"!! unknown key {key}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"opt:{key}")
        df = QUERIES[key](spark, args.sf_dir)
        if not args.no_plan:
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{key}_{args.tag}.txt"), "w") as f:
                f.write(plan)
        samples = []
        w0 = time.perf_counter()
        QUERIES[key](spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        warm = time.perf_counter() - w0
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            QUERIES[key](spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        out[key] = {
            "median_sec": round(statistics.median(samples), 3),
            "warm_sec": round(warm, 3),
            "samples": [round(s, 3) for s in samples],
        }
        print(f"{key:30s} median {out[key]['median_sec']:7.3f}  warm {warm:6.3f}  {out[key]['samples']}")
        spark.sparkContext.setJobDescription(None)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
