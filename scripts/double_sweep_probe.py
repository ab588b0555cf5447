"""Double-sweep pollution probe (r15; VERDICT r14 item 2 done-criterion).

Measures session-state accumulation: time a probe set fresh, run one
full sweep over every registered query (the bench's workload), then
re-time the same probes in the same session. r14 measured probes
1.25-1.3x slower after one sweep (checkpoint blocks surviving
``clearCache``); the release valve (m5_competition_kaggle_spark.blocks)
must hold the inflation under 5%.

Usage:
  python scripts/double_sweep_probe.py            # valve active
  python scripts/double_sweep_probe.py --no-valve # valve disabled (A/B)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBES = [
    "x52_hist_quantiles",
    "x64_setsim_join",
    "x75_basket_lift",
    "x145_calibration_ece",
    "x158_pair_distances",
    "x147_tracking_signal",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-valve", action="store_true")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    if args.no_valve:
        from m5_competition_kaggle_spark import blocks
        blocks.release_persistent_blocks = lambda spark: 0

    import __spark_entry__ as entry_mod
    from m5_competition_kaggle_spark.session import get_spark

    spark = get_spark("double-sweep-probe")
    qs = entry_mod.queries()

    def consume(df):
        df.write.format("noop").mode("overwrite").save()

    def time_probes(tag):
        out = {}
        for name in PROBES:
            best = float("inf")
            for _ in range(args.reps):
                spark.catalog.clearCache()
                t0 = time.time()
                consume(qs[name](spark, args.sf_dir))
                best = min(best, time.time() - t0)
            out[name] = round(best, 3)
        print(f"[{tag}] " + json.dumps(out), flush=True)
        return out

    consume(qs["q1_filter_project"](spark, args.sf_dir))  # warm-up
    fresh = time_probes("fresh")

    t0 = time.time()
    for name, fn in qs.items():
        spark.catalog.clearCache()
        consume(fn(spark, args.sf_dir))
    print(f"[sweep] full 1-rep sweep: {time.time()-t0:.1f}s", flush=True)

    polluted = time_probes("after-sweep")
    ratios = {k: round(polluted[k] / fresh[k], 3) for k in PROBES}
    worst = max(ratios.values())
    print(json.dumps({
        "valve": not args.no_valve,
        "ratios_after_over_fresh": ratios,
        "worst": worst,
        "pass_under_1.05": worst < 1.05,
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
