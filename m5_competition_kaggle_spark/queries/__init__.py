"""Declared, oracle-checked queries (SURVEY §2.1 + extensions).

Each module contributes two dicts keyed by query name:
- ``QUERIES``: name → callable(spark, sf_dir) → DataFrame (the engine path)
- ``ORACLES``: name → ANSI SQL string DuckDB runs on the same parquet
  (omitted for non-SQL-expressible ops → driver does a rows-only check)

``__spark_entry__.py`` at the repo root merges these for the driver.
"""

from __future__ import annotations

from m5_competition_kaggle_spark.queries import core


def all_queries():
    merged = {}
    merged.update(core.QUERIES)
    for mod_name in ("extensions", "streaming_shaped", "analytics"):
        try:
            import importlib

            mod = importlib.import_module(
                f"m5_competition_kaggle_spark.queries.{mod_name}"
            )
            merged.update(mod.QUERIES)
        except ImportError:
            pass
    return merged


def all_oracles():
    merged = {}
    merged.update(core.ORACLES)
    for mod_name in ("extensions", "streaming_shaped", "analytics"):
        try:
            import importlib

            mod = importlib.import_module(
                f"m5_competition_kaggle_spark.queries.{mod_name}"
            )
            merged.update(mod.ORACLES)
        except ImportError:
            pass
    return merged
