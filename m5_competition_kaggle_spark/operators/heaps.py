"""Vocabulary-growth (Heaps-law) curve over a document corpus — the
corpus-health diagnostic the per-snapshot vocab views (x30 top-k,
x106 drift, x62 OOV) don't give: HOW does the type inventory grow as
documents accumulate? A healthy natural-language corpus grows types
sublinearly (Heaps V ≈ K·n^β, β < 1, i.e. type-token ratio falls
along the curve); a corpus poisoned by serial-number-like junk grows
linearly, and heavy duplication grows flatter than language should.

Types here are TRIGRAM shingles (the x2/x14 shingle idiom), not bare
unigrams — the synthetic fixture's unigram vocabulary saturates in
the first decile (31 words), which would certify a constant, while
its trigram inventory keeps growing corpus-long (16.5k types at
sf0.001), so the curve does real work at every checkpoint.

Plan, decile-checkpointed so the output is 10 rows regardless of
corpus size:

1. tokenize (the x30 lowercase-alnum rule), shingle per doc, and
   reduce immediately to two keyed aggregates — per-DOC token counts
   and per-TYPE first document — so everything after is |docs| or
   |types| rows, never token rows;
2. rank docs by id and take cumulative token sums and cumulative
   first-occurrence counts via the TWO-PHASE distributed prefix scan
   (``operators/prefix.global_running_sum`` — range-partition, local
   window, broadcast per-partition offsets), so no single-partition
   exchange ever sees the |docs|-row table;
3. emit the last rank of each decile with the exact integer
   type-token ratio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

TOKEN_SPLIT = "[^a-z0-9]+"


def _arr(text_col: str) -> F.Column:
    return F.expr(
        f"filter(split(lower({text_col}), '{TOKEN_SPLIT}'), "
        "x -> x != '')"
    )


def _trigrams(arr_col: str) -> F.Column:
    return F.expr(
        f"CASE WHEN size({arr_col}) >= 3 THEN "
        f"transform(sequence(1, size({arr_col}) - 2), i -> "
        f"concat_ws(' ', element_at({arr_col}, i), "
        f"element_at({arr_col}, i + 1), "
        f"element_at({arr_col}, i + 2))) "
        "ELSE array() END"
    )


def vocab_growth_deciles(
    docs: DataFrame,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Ten (decile, docs, tokens_cum, types_cum, ttr_ppm) checkpoints
    along the doc-id-ordered corpus; types are trigram shingles,
    ttr_ppm = 10⁶·types DIV tokens — falling deciles ⇒
    Heaps-consistent sublinear growth."""
    base = docs.select(
        F.col(doc_id_col).alias("d"), _arr(text_col).alias("arr")
    )
    per_doc = base.select(
        "d", F.size("arr").cast("long").alias("nt")
    )
    first = (
        base.select(
            "d", F.explode(_trigrams("arr")).alias("ty")
        )
        .groupBy("ty")
        .agg(F.min("d").alias("fd"))
    )
    new_types = first.groupBy(F.col("fd").alias("d")).agg(
        F.count(F.lit(1)).alias("new_ty")
    )
    from m5_competition_kaggle_spark.operators.prefix import (
        global_running_sums,
    )

    joined = per_doc.join(new_types, "d", "left").select(
        "d",
        "nt",
        F.coalesce("new_ty", F.lit(0)).alias("new_ty"),
        F.lit(1).cast("long").alias("__one"),
    )
    n_docs = F.broadcast(
        joined.agg(F.count(F.lit(1)).alias("n_docs"))
    )
    # r14: the three scans share one order ("d") — one range exchange /
    # window / checkpoint / offset pass instead of three chained ones.
    scanned = global_running_sums(
        joined,
        ("nt", "new_ty", "__one"),
        ("d",),
        ("tokens_cum", "types_cum", "r"),
    )
    cum = scanned.crossJoin(n_docs).select(
        "r", "tokens_cum", "types_cum", "n_docs"
    )
    # decile of rank r = ceil(10·r/N); the checkpoint is the LAST
    # rank inside each decile, so exactly 10 rows emerge for N >= 10
    cp = cum.withColumn(
        "decile",
        F.expr("CAST((10 * r + n_docs - 1) DIV n_docs AS BIGINT)"),
    )
    w_dec = Window.partitionBy("decile").orderBy(F.col("r").desc())
    return (
        cp.withColumn("__rn", F.row_number().over(w_dec))
        .filter(F.col("__rn") == 1)
        .select(
            "decile",
            F.col("r").alias("docs"),
            "tokens_cum",
            "types_cum",
            # tokens_cum = 0 is reachable on degenerate input (an
            # all-empty-text first decile): Spark non-ANSI DIV would
            # NULL while DuckDB `//` raises division-by-zero, so the
            # guard keeps the differential well-defined on ANY input.
            # No-op on real corpora (any token ⇒ tokens_cum ≥ 1).
            F.expr(
                "CASE WHEN tokens_cum > 0 "
                "THEN 1000000 * types_cum DIV tokens_cum END"
            ).alias("ttr_ppm"),
        )
    )
