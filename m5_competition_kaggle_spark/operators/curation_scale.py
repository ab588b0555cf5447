"""Production-scale Bloom decontamination — the no-audit fast path.

``operators.curation.bloom_contamination_stats`` certifies the Bloom
mechanism by ALSO computing the exact shingle-string join it exists to
avoid (false-positive accounting — the right default for a certified
query, kept by x46). At 100 TB that audit join is the cost driver: the
corpus side has to materialize and broadcast-probe full shingle STRINGS
a second time. This module is the flag the r4 verdict asked for
(What's wrong #4): ``bloom_decontaminate(..., exact_audit=False)``
probes with 64-bit shingle hashes only — no string column survives past
the per-row hash projection, no join or exchange ever carries a
shingle string, and the only broadcast stays the ≤ 2^14 set-bit
positions. ``exact_audit=True`` delegates to the audited operator
unchanged.

Lives in its own module for the r5 certification-window reason (see
queries/__init__.py): curation.py is in 23 banked queries' hash closure
and may not be edited this round; folding the flag into
``bloom_contamination_stats`` itself is queued for the r6 batch.

Determinism note: grouping probe results by the shingle's h64 instead
of its string merges h64-colliding shingles within one document (their
combined probe group then has 2K set-bit hits and is conservatively
dropped, like the audited operator drops nothing — a miss, not a false
drop). At 64 bits this is a ~1e-19 per-pair event; it is part of the
operator's deterministic definition, so the planned x48 oracle twin
reproduces it exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.curation import (
    BLOOM_K,
    BLOOM_M,
    bloom_contamination_stats,
    h64_sql,
)
from m5_competition_kaggle_spark.operators.dedup import doc_shingles


def _positions_from_h(h_col: str) -> Column:
    """BLOOM_K bit positions from an ALREADY-HASHED int64 column — same
    double-hashing arithmetic as ``curation._bloom_positions`` (h1 = low
    30 bits, h2 = high bits forced odd), minus the md5 recomputation, so
    probes can ride a long column instead of the shingle string."""
    return F.expr(
        "array("
        + ", ".join(
            f"pmod((({h_col}) % {1 << 30}) + {i} * "
            f"((({h_col}) div {1 << 30}) * 2 + 1), {BLOOM_M})"
            for i in range(BLOOM_K)
        )
        + ")"
    )


def bloom_decontaminate(
    df: DataFrame,
    key_col: str,
    text_col: str | None,
    bench_pred: Column,
    shingle_size: int = 4,
    tokens_col: str | None = None,
    exact_audit: bool = False,
) -> DataFrame:
    """Per-document Bloom contamination counts, sized for 100 TB.

    Returns (key, n_shingles, bloom_hits) per corpus document (plus
    exact_hits / false_positives columns when ``exact_audit=True``,
    via the audited operator). Production pipelines drop documents with
    ``bloom_hits > 0`` and pay only the Bloom false-positive rate, which
    the audit mode quantifies on a sample.

    Fast-path plan shape (asserted in tests/test_curation_scale.py):

    - benchmark shingles → distinct set-bit positions: ≤ 2^14 ints,
      the ONLY broadcast, corpus-size-independent;
    - corpus shingles → (key, h64, pos) probe rows: the string dies in
      the same projection that hashes it, so every exchange downstream
      carries fixed-width ints — no join on a shingle string anywhere;
    - positives: broadcast equi-join on pos, then a (key, h64) count
      == K filter — only Bloom-positive probes (benchmark-sized, not
      corpus-sized) reach that aggregation exchange.
    """
    if exact_audit:
        return bloom_contamination_stats(
            df, key_col, text_col, bench_pred, shingle_size,
            tokens_col=tokens_col,
        )
    # Benchmark side: dedup by the shingle's h64, not the string — bit
    # positions are a pure function of h, so the resulting bit SET is
    # identical (even under h64 collisions) while the distinct exchange
    # carries 8-byte ints. No shingle string crosses an exchange on
    # either side of this operator.
    bench_h = (
        doc_shingles(
            df.filter(bench_pred), key_col, text_col, shingle_size,
            tokens_col=tokens_col,
        )
        .select(F.expr(h64_sql("shingle")).alias("__h"))
        .distinct()
    )
    bits = (
        bench_h.select(
            F.explode(_positions_from_h("__h")).alias("pos")
        )
        .distinct()
    )
    corpus_sh = doc_shingles(
        df.filter(~bench_pred), key_col, text_col, shingle_size,
        tokens_col=tokens_col,
    )
    hashed = corpus_sh.select(
        key_col, F.expr(h64_sql("shingle")).alias("__h")
    )
    probes = hashed.select(
        key_col, "__h", F.explode(_positions_from_h("__h")).alias("pos")
    )
    sh_flags = (
        probes.join(F.broadcast(bits), "pos")
        .groupBy(key_col, "__h")
        .agg(F.count(F.lit(1)).alias("k_hit"))
        .filter(F.col("k_hit") == BLOOM_K)
    )
    bloom_per_doc = sh_flags.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("bloom_hits")
    )
    totals = corpus_sh.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    return totals.join(bloom_per_doc, key_col, "left").select(
        F.col(key_col),
        "n_shingles",
        F.coalesce("bloom_hits", F.lit(0)).alias("bloom_hits"),
    )
