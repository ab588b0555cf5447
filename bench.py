"""Benchmark harness: times every declared query at the bench scale factor.

Output contract (driver captures only the LAST 2000 chars of stdout —
BENCH_r02 went unparsed because the single full JSON line outgrew that
window as the query count passed ~70):

  line 1:    full JSON {"metric", "value", "unit", "queries": {ALL}, "sf"}
  file:      BENCH.local.json — same full JSON, committed for the judge
  last line: compact JSON (same metric/value/unit/sf, only the slowest
             queries inline, "full_results" pointing at the file) — sized
             to always fit the tail-capture window.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default 32).

Each query executes end-to-end into a noop sink (full plan runs, nothing
collected to the driver). One warm-up query amortizes JVM/codegen startup
out of the numbers.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def consume(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    import __spark_entry__ as entry_mod
    from m5_competition_kaggle_spark.session import get_spark

    spark = get_spark("bench")
    qs = entry_mod.queries()

    # warm-up: run the cheapest query once to pay JVM/codegen startup
    consume(qs["q1_filter_project"](spark, sf_dir))

    # best-of-2: one JVM/GC hiccup shouldn't misrepresent a plan.
    # Each rep starts from a CLEARED session cache (r3 verdict item 7):
    # shared cached intermediates (e.g. the minhash shingle table) made
    # per-query numbers depend on run ORDER — x2/x24 swapped 1.4× in r3
    # purely by who ran first. Cold, attributable numbers cost a higher
    # total but compare honestly round-over-round.
    timings: dict[str, float] = {}
    for name, fn in qs.items():
        best = float("inf")
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.time()
            consume(fn(spark, sf_dir))
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    # 1-minute load average BEFORE this bench's own work is attributed:
    # totals shift wholesale (measured 1.2-3.2x) with machine state, so
    # cross-round comparisons need the context recorded next to the
    # numbers. (Sampled at end of run — it reflects the run itself too;
    # a value far above SPARK_GRAFT_CPUS means a contended box.)
    try:
        load1 = round(os.getloadavg()[0], 1)
    except OSError:
        load1 = None
    full = {
        "metric": "total_query_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "load1": load1,
    }
    # Full results: first stdout line + a committed file the judge reads.
    print(json.dumps(full), flush=True)
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH.local.json"
    )
    with open(out_path, "w") as f:
        json.dump(full, f, indent=1)
        f.write("\n")
    # Compact final line: must fit the driver's 2000-char tail window
    # whole (it scans the tail for a parseable {"metric"...} line).
    slowest = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:15]
    )
    compact = {
        "metric": "total_query_seconds",
        "value": full["value"],
        "unit": "sec",
        "queries": slowest,
        "sf": sf,
        "n_queries": len(timings),
        "load1": load1,
        "full_results": "BENCH.local.json",
    }
    line = json.dumps(compact)
    if len(line) >= 1500:  # raise, not assert: -O must not skip this
        raise RuntimeError(
            f"compact bench line {len(line)} chars — would overflow "
            "the driver's 2000-char tail capture"
        )
    print(line, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
