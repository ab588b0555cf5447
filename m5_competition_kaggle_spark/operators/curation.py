"""Corpus-curation operators for large-scale training-data pipelines.

Extension surface beyond the reference (which has no text pipeline):
document chunking, benchmark decontamination, stratified deterministic
sampling, and repetition-based quality metrics — the standard curation
steps between raw crawl and training shards. All pure DataFrame
expressions (JVM-side, codegen'd) or broadcast-bounded joins, so each
plan survives a 100 TB corpus:

- chunking:       per-row array expressions, embarrassingly parallel.
- decontaminate:  corpus shingles ⋈ broadcast(benchmark shingles) —
                  benchmark suites are tiny at any corpus scale, so the
                  join side that grows is never shuffled by shingle.
- stratified:     pure hash predicate per row (leakage-free, rerunnable).
- repetition:     per-row array expressions (n-gram distinct ratios).

Determinism: hashing via ``functions.text.h64`` and integer permille
thresholds, so DuckDB oracles replicate results bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.functions.text import h64, tokens
from m5_competition_kaggle_spark.operators.dedup import doc_shingles


def chunk_documents(
    df: DataFrame,
    key_col: str,
    text_col: str,
    chunk_size: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Sliding-window token chunking with overlap (chunk_size − stride).

    One chunk starts at every token offset ``0, stride, 2·stride, …`` below
    the document length; the final chunk may be short. Returns one row per
    chunk: (key, chunk_idx, chunk_start, n_chunk_tokens, chunk_hash) where
    chunk_hash = h64 of the space-joined chunk text — the id downstream
    chunk-level dedup or embedding jobs key on.
    """
    assert 0 < stride <= chunk_size, "stride must be in (0, chunk_size]"
    out = df.select(F.col(key_col), tokens(text_col).alias("__toks"))
    out = out.select(
        key_col,
        "__toks",
        F.explode(
            F.expr(f"sequence(0, size(__toks) - 1, {stride})")
        ).alias("chunk_start"),
    )
    chunk = F.expr(f"slice(__toks, chunk_start + 1, {chunk_size})")
    return out.select(
        F.col(key_col),
        (F.col("chunk_start") / stride).cast("long").alias("chunk_idx"),
        F.col("chunk_start").cast("long").alias("chunk_start"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        h64(F.concat_ws(" ", chunk)).alias("chunk_hash"),
    )


def contamination_hits(
    df: DataFrame,
    key_col: str,
    text_col: str,
    bench_pred: Column,
    shingle_size: int = 5,
) -> DataFrame:
    """Benchmark decontamination: corpus documents sharing ≥1 token
    n-gram with any benchmark document, with the shared-shingle count.

    ``bench_pred`` (a boolean Column over ``key_col``) defines the
    benchmark split. The benchmark's distinct shingle set broadcasts —
    eval suites stay small while the corpus grows, so the corpus side is
    never shuffled by shingle. Returns (key, n_hits), hit docs only;
    anti-join this against the corpus to drop them.
    """
    # Filter BEFORE shingling: the benchmark branch only tokenizes its
    # tiny split instead of re-shingling the whole corpus a second time.
    bench = (
        doc_shingles(df.filter(bench_pred), key_col, text_col, shingle_size)
        .select("shingle")
        .distinct()
    )
    corpus = doc_shingles(
        df.filter(~bench_pred), key_col, text_col, shingle_size
    )
    return (
        corpus.join(F.broadcast(bench), "shingle")
        # doc_shingles is distinct per (key, shingle) → count == distinct
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def stratified_keep(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    permille: dict[str, int],
    default_permille: int = 100,
) -> Column:
    """Deterministic per-stratum sampling predicate: keep a row iff
    ``h64(key) mod 1000 < permille[stratum]``. The standard domain/language
    mixing knob: content-independent, stable across runs and engines, and
    joins can't leak rows across the kept/dropped split because membership
    is a pure function of the key."""
    rate = F.lit(default_permille)
    for stratum, p in sorted(permille.items()):
        rate = F.when(F.col(stratum_col) == stratum, F.lit(p)).otherwise(rate)
    return (h64(F.col(key_col).cast("string")) % 1000) < rate


def repetition_features(
    df: DataFrame, text_col: str, flag_threshold: float = 0.5
) -> DataFrame:
    """Repetition-based quality metrics (Gopher-style): the fraction of
    duplicated token bigrams / trigrams per document, and a repetitive
    flag. Pure array expressions — no explode, no shuffle."""
    out = df.withColumn("__toks", tokens(text_col))

    def grams(n: int) -> Column:
        g = (
            f"transform(sequence(1, size(__toks) - {n - 1}), "
            f"i -> concat_ws(' ', slice(__toks, i, {n})))"
        )
        # sequence() counts DOWN when the stop is below the start — guard
        # short docs to an empty gram list instead
        return F.expr(
            f"CASE WHEN size(__toks) >= {n} THEN {g} ELSE array() END"
        )

    def dup_frac(col: str) -> Column:
        return F.expr(
            f"(size({col}) - size(array_distinct({col}))) * 1.0D"
            f" / greatest(size({col}), 1)"
        )

    # Materialize each gram array in its own projection so the transform
    # runs once per row, not once per reference (CollapseProject keeps
    # multi-referenced non-cheap expressions in a separate stage).
    out = out.withColumns({"__g2": grams(2), "__g3": grams(3)})
    out = out.withColumns(
        {
            "n_tokens": F.size("__toks").cast("long"),
            "dup_bigram_frac": dup_frac("__g2"),
            "dup_trigram_frac": dup_frac("__g3"),
        }
    ).drop("__g2", "__g3")
    return out.withColumn(
        "is_repetitive", F.col("dup_bigram_frac") > F.lit(flag_threshold)
    ).drop("__toks")
