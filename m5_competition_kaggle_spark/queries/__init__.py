"""Declared, oracle-checked queries (SURVEY §2.1 + extensions).

Each module contributes two dicts keyed by query name:
- ``QUERIES``: name → callable(spark, sf_dir) → DataFrame (the engine path)
- ``ORACLES``: name → ANSI SQL string DuckDB runs on the same parquet
  (omitted for non-SQL-expressible ops → driver does a rows-only check)

``__spark_entry__.py`` at the repo root merges these for the driver.
Imports are deliberately strict: a broken query module must fail loudly
here, not silently shrink the declared set the driver checks.
"""

from __future__ import annotations

from m5_competition_kaggle_spark.queries import (
    analytics,
    core,
    extensions,
    streaming_shaped,
)

_MODULES = (core, extensions, streaming_shaped, analytics)


def all_queries():
    merged = {}
    for mod in _MODULES:
        overlap = merged.keys() & mod.QUERIES.keys()
        assert not overlap, f"duplicate query names: {sorted(overlap)}"
        merged.update(mod.QUERIES)
    return merged


def all_oracles():
    merged = {}
    for mod in _MODULES:
        merged.update(mod.ORACLES)
    return merged
