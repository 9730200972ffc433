"""r18 optimization probe: isolate registry keys, time + explain + jobs.

Times each named registry key with the noop sink (guide §1.4) in one
session, min-of-N with per-run list printed so spread is visible,
counts the Spark jobs each noop action dispatches (statusTracker
delta — the AQE job-count constant the ingest dialects pay), and
optionally writes .explain("formatted") to plans/r18/<key>_<tag>.txt
(guide §1: capture the plan shape before/after every change).

Run: PYTHONPATH=. python scripts/r18_probe.py KEY [KEY...]
       [--runs N] [--explain TAG] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import os
import time

from gentropy_spark.plans import full_registry
from gentropy_spark.session import get_session, release_caches


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--explain", default=None,
                    help="write plans/r18/<key>_<TAG>.txt explain output")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    os.environ.setdefault("GENTROPY_SPARK_NATIVE_SUMS", "1")
    spark = get_session(app_name="gentropy_r18_probe")
    reg = full_registry()
    # Warm the JVM once (guide §1: measure the engine, not first-call
    # JIT latency).
    reg["q1_pricing_summary"].fn(spark, args.sf_dir).collect()
    tracker = spark.sparkContext.statusTracker()

    for key in args.keys:
        fn = reg[key].fn
        if args.explain:
            os.makedirs("plans/r18", exist_ok=True)
            df = fn(spark, args.sf_dir)
            path = f"plans/r18/{key}_{args.explain}.txt"
            with open(path, "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            release_caches()
            print(f"{key}: wrote {path}")
        runs = []
        jobs = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"r18probe:{key}#{i}")
            j0 = len(tracker.getJobIdsForGroup(None))
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop").mode(
                "overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            jobs.append(len(tracker.getJobIdsForGroup(None)) - j0)
            release_caches()
        spark.sparkContext.setJobDescription(None)
        print(f"{key}: min={min(runs)} runs={runs} jobs={jobs}")


if __name__ == "__main__":
    main()
