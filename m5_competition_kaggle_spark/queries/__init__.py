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
# for unchanged code — a contract scripts/certification_ledger.py now
# ENFORCES via per-query transitive code hashes), so the head-50 is a
# rotating certification window:
#
# Round-4 head composition (VERDICT.md r3 items 1-3): this round edited
# llm_curation (x33 integer-exact), similarity (top-k sentinel fix),
# graph (CC invariant check), streaming_shaped (s8 integer-exact), and
# catalog (schema-sniff fallback) — catalog is in EVERY query's closure,
# so all 92 banked rows went stale at once. The r4 head takes every
# query whose own module changed semantically; the leftover stale set
# (core q1–q23 + the untouched extensions) is promotion-queued for r5.
#
#   1. x33 — r3's one hash-FAIL, now integer-exact; must re-certify.
#   2. All 20 llm_curation queries (module edited).
#   3. x9/x10/x12 — similarity module consumers (sentinel fix).
#   4. s1–s8 (streaming_shaped edited for s8).
#   5. g1–g18 (analytics; banking fresh post-catalog-change rows).
#
# Everything not in the effective head lands in the tail, ordered as
# registered. Stale/never-certified tail queries are auto-promoted into
# remaining head slots via the generated _promotions.py (deliberate
# _HEAD entries always keep priority; see _effective_head).
_HEAD = (
    "x33_source_caps",
    # -- llm_curation module (edited this round) -----------------------
    "x19_chunk_docs",
    "x20_decontaminate",
    "x21_stratified_sample",
    "x22_repetition_quality",
    "x23_sim_topk_ivf",
    "x24_dedup_clusters",
    "x25_pii_redact",
    "x26_pack_shards",
    "x27_importance_sample",
    "x28_model_quality",
    "x29_corpus_to_shards",
    "x30_vocab_topk",
    "x31_lm_surprisal",
    "x32_tfidf_keywords",
    "x34_dup_spans",
    "x35_temperature_mix",
    "x36_hashed_tf",
    "x40_length_buckets",
    "x41_pagerank",
    "x44_score_fixed",
    "x45_hll_distinct",
    "x46_bloom_decontaminate",
    # -- similarity module consumers (sentinel fix) --------------------
    "x9_sim_topk",
    "x10_sim_topk_lsh",
    "x12_embed_near_dup",
    # -- streaming_shaped (s8 integer-exact rewrite) -------------------
    "s1_tumbling",
    "s2_sliding",
    "s3_session",
    "s4_running_totals",
    "s5_ewma",
    "s6_stream_dedup",
    "s7_funnel_join",
    "s8_stream_static_enrich",
    # -- analytics ------------------------------------------------------
    "g1_pricing_summary",
    "g2_revenue_by_nation",
    "g3_top_customers_per_segment",
    "g4_rollup_revenue",
    "g5_distinct_agg",
    "g6_semi_anti_joins",
    "g7_set_ops",
    "g8_median_quantiles",
    "g9_cube_revenue",
    "g10_range_frame_window",
    "g11_gap_fill_locf",
    "g12_correlated_subquery",
    # g13/g14 yield their slots to x45/x46 this round; the promotions
    # queue re-certifies them next round with the rest of the stale
    # overflow.
    "g15_rank_distribution",
    "g16_pivot_multi_agg",
    "g17_sessionize_gaps",
    "g18_transition_counts",
)

HEAD_CAP = 50

# Staleness enforcement (r3 verdict item 2): scripts/certification_ledger.py
# hashes every query's transitive code file set at each round's certified
# commit; queries whose banked green rows went stale (or that were never
# certified) land in the generated _promotions.py and fill any head
# slots left after the deliberate _HEAD entries, so a drifted tail query
# is re-certified by the next driver run instead of silently coasting on
# an invalid banked row. Deliberate _HEAD picks keep priority — when the
# stale set is larger than the remaining slots (e.g. a catalog.py edit
# staling all 92 closures at once), the overflow stays promotion-queued
# for the following round.
try:
    from m5_competition_kaggle_spark.queries._promotions import (
        STALE_PROMOTIONS,
    )
except ImportError:  # ledger not yet generated
    STALE_PROMOTIONS = ()


def _effective_head() -> tuple[str, ...]:
    return tuple(dict.fromkeys([*_HEAD, *STALE_PROMOTIONS]))[:HEAD_CAP]


def _reorder(merged: dict, require_all: bool = False) -> dict:
    # require_all only for the query dict: oracle-less (rows-only) queries
    # legitimately have no ORACLES entry.
    head_names = _effective_head()
    if require_all:
        missing = [k for k in head_names if k not in merged]
        assert not missing, f"head names not registered: {missing}"
    assert len(_HEAD) <= HEAD_CAP, (
        f"_HEAD has {len(_HEAD)} entries; driver certifies only the first "
        f"{HEAD_CAP} — drop a fill entry"
    )
    head = {k: merged[k] for k in head_names if k in merged}
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
