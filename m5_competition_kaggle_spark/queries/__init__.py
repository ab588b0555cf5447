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
    llm_curation,
    streaming_shaped,
)

_MODULES = (core, extensions, streaming_shaped, analytics, llm_curation)

# Registration order is a driver contract: CORRECTNESS_r01.json recorded
# exactly the FIRST 50 registered queries (g5–g8, the tail, got no rows).
# Keep every oracle-bearing query inside the first 50 slots; the tail
# holds the queries whose loss costs the least driver signal — x10/x17
# have no oracle by design (recall/accuracy pytest-certified), and
# q18/q19's operators (W1/W2/W3 + F9) are all certified by q7/q8/q9/q15.
_TAIL = (
    "q18_feature_pipeline",
    "q19_rolling_multi",
    "x10_sim_topk_lsh",
    "x17_approx_sketches",
)


def _reorder(merged: dict) -> dict:
    head = {k: v for k, v in merged.items() if k not in _TAIL}
    tail = {k: merged[k] for k in _TAIL if k in merged}
    return {**head, **tail}


def all_queries():
    merged = {}
    for mod in _MODULES:
        overlap = merged.keys() & mod.QUERIES.keys()
        assert not overlap, f"duplicate query names: {sorted(overlap)}"
        merged.update(mod.QUERIES)
    return _reorder(merged)


def all_oracles():
    merged = {}
    for mod in _MODULES:
        overlap = merged.keys() & mod.ORACLES.keys()
        assert not overlap, f"duplicate oracle names: {sorted(overlap)}"
        merged.update(mod.ORACLES)
    return _reorder(merged)
