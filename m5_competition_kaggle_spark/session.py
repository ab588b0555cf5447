"""SparkSession factory.

One place to set the scale-sensitive knobs so every entry point (tests,
bench, driver contract) runs with the same, cluster-ready configuration:

- AQE on (runtime re-plan, partition coalescing, skew-join handling);
- Arrow on (vectorized pandas-UDF exchange for the ML layer);
- UTC session timezone (DuckDB-oracle comparability; DuckDB timestamps are
  UTC-naive);
- shuffle partitions sized to the local core count rather than the 200
  default (on a real cluster this is overridden via ``extra_conf`` or
  spark-submit; AQE coalescing makes the exact number forgiving).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "m5_competition_kaggle_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``cpus`` controls both local parallelism and the shuffle-partition
    count; at cluster scale pass ``extra_conf`` to override anything here.
    """
    n = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # InferFiltersFromGenerate duplicates the generator's input
        # expression into a pre-exchange Filter: for explode(<computed
        # array>) the whole tokenize/shingle expression then runs in the
        # SCAN stage (often 1 task) — measured 3s of single-threaded CPU
        # per branch on x20. Our exploded arrays are never empty/null, so
        # the inferred filter only burns CPU; exclude the rule.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        # testdata events.parquet uses TIMESTAMP(NANOS) — read as long
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        # keep stdout clean: the driver's bench harness tail-captures
        # stdout, and \r progress bars pollute the capture window
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # The between-queries release valve (blocks.py) nudges the JVM
        # GC so the ContextCleaner drains broadcast/shuffle state a
        # long session accumulates; make that explicit GC a CONCURRENT
        # G1 cycle instead of a stop-the-world full GC so the nudge
        # never pauses a timed query (r15; the r14 periodic-GC knob
        # failed its A/B precisely because full-GC pauses landed
        # inside queries).
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:+ExplicitGCInvokesConcurrent",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
