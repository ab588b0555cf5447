"""Per-query profiler for the optimization rounds (guide §1).

For each named query: capture ``explain("formatted")`` to a file and
time the noop-sink execution (best of N reps, cache cleared between
reps — the bench methodology), optionally recording per-job wall
times via the status tracker so multi-job plans (localCheckpoint,
broadcast builds, convergence loops) are attributable.

Usage:
  python scripts/profile_query.py x140_pinball x129_bootstrap_ci
  python scripts/profile_query.py --plans-dir plans/r14 --tag before x140_pinball
  python scripts/profile_query.py --reps 3 --all-top 30   # slowest 30 from BENCH.local.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--plans-dir", default=None, help="write explain('formatted') here")
    ap.add_argument("--tag", default=None, help="suffix for plan files, e.g. before/after")
    ap.add_argument("--all-top", type=int, default=0, help="profile the N slowest from BENCH.local.json")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from m5_competition_kaggle_spark.session import get_spark

    qs = entry_mod.queries()
    names = list(args.names)
    if args.all_top:
        bench = json.load(open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH.local.json")))
        top = sorted(bench["queries"].items(), key=lambda kv: -kv[1])[: args.all_top]
        names += [k for k, _ in top if k not in names]
    unknown = [n for n in names if n not in qs]
    if unknown:
        print("unknown queries:", unknown)
        return 2

    spark = get_spark("profile")
    sc = spark.sparkContext

    # warm-up
    qs["q1_filter_project"](spark, args.sf_dir).write.format("noop").mode("overwrite").save()

    results = {}
    for name in names:
        fn = qs[name]
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = fn(spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
            suffix = f"_{args.tag}" if args.tag else ""
            with open(os.path.join(args.plans_dir, f"{name}{suffix}.txt"), "w") as f:
                f.write(plan)
        best = float("inf")
        per_rep = []
        for _ in range(args.reps):
            spark.catalog.clearCache()
            sc.setJobDescription(name)
            t0 = time.time()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            per_rep.append(round(dt, 3))
            best = min(best, dt)
        sc.setJobDescription(None)
        results[name] = round(best, 3)
        print(f"{best:7.3f}  {name}  reps={per_rep}", flush=True)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
