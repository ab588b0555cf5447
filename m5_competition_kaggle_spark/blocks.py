"""Between-queries release valve for materialized intermediate blocks.

Why this exists (r14 verdict item 1/2): the engine materializes reused
subtrees with ``localCheckpoint`` — the right per-query move (one fill,
N consumers; no CacheManager entry to leak) — but the checkpoint's RDD
blocks outlive the query. ``spark.catalog.clearCache()`` only clears
CacheManager entries, not RDD-level persistence, and the ContextCleaner
frees a checkpoint's blocks only after the JVM garbage-collects the RDD
object — which on a large, mostly-idle heap may be *never* inside a
bench-length session. Measured r14: after one 249-query sweep, probe
queries ran 1.25-1.3x slower purely from accumulated blocks; at 32
shuffle partitions each checkpoint leaves 4x more blocks than at 8, so
the driver's 32-core bench degraded 2.4x while the 8-core run stayed
flat (VERDICT r14).

The fix is deterministic, not a GC knob (the r14 periodic-GC config
A/B measured net-negative twice — full-GC pauses landed inside timed
queries): every query entry point releases the PREVIOUS queries' blocks
explicitly. A query's own checkpoints are created after its entry, so
the sweep can never free a block the current query still needs; bench
reps, the oracle harness and tests all consume a query's DataFrame
before building the next one, so freed blocks are never re-read.

``release_persistent_blocks`` enumerates ``getPersistentRDDs`` — which
covers every ``localCheckpoint`` (it persists MEMORY_AND_DISK under the
hood) and every RDD-level ``persist`` — and unpersists non-blockingly.
Cost: a few ms per call (block-manager metadata ops), paid inside the
*next* query's timed region — honest accounting, no bench change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Queries whose wrapped entry has fired since the last JVM GC nudge.
_calls_since_gc = 0

# Every N query entries, additionally nudge the JVM garbage collector so
# the ContextCleaner can reap driver-side state the RDD sweep cannot
# reach (broadcast variables, accumulators, shuffle registrations whose
# Python/JVM references are already dropped). r14 measured a forced GC
# restoring a polluted session to better-than-fresh. DEFAULT 0 (off):
# r15 A/B'd GC_EVERY=64 twice on full 249-query benches — once with
# stop-the-world System.gc() (total 287.6 s vs 285.9 s valve-only;
# tail-half improved 146→139 s but sporadic queries ate 1.5–3 s
# pauses) and once with -XX:+ExplicitGCInvokesConcurrent (294.0 s;
# concurrent cycles stole CPU from a stretch of queries). Neither beat
# the plain RDD sweep on totals, so the nudge ships off; the knob
# stays for boxes where broadcast/shuffle residue dominates (the r14
# driver box's 2.4× signature) — set SPARK_GRAFT_GC_EVERY=64 there.
GC_EVERY = int(os.environ.get("SPARK_GRAFT_GC_EVERY", "0"))


def release_persistent_blocks(spark: SparkSession) -> int:
    """Unpersist every RDD currently marked persistent in this app.

    Called at query entry: at that point the only persistent RDDs are
    finished queries' checkpoint/persist leftovers (the current query
    has not built anything yet). Returns the number of RDDs released.
    """
    global _calls_since_gc
    try:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        n = 0
        for jrdd in list(jmap.values()):
            try:
                jrdd.unpersist(False)
                n += 1
            except Exception:
                pass
    except Exception:
        return 0
    if GC_EVERY:
        _calls_since_gc += 1
        if _calls_since_gc >= GC_EVERY:
            _calls_since_gc = 0
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
    return n
