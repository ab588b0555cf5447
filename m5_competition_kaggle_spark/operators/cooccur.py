"""Co-occurrence mining: basket pair lift, character-pair (BPE-step)
counts, and bigram next-token tables.

Three members of the same family — "count things that appear together,
keyed, never all-pairs":

- ``basket_pair_lift``: market-basket association pairs. The self-join
  is keyed on the basket id, so fan-out is bounded by the per-basket
  item count (square of it, per basket) — the classic a-priori
  candidate step, NOT a global cross join. Lift is emitted as an exact
  integer rational (``lift_num``/``lift_den``) against independence.
- ``char_pair_counts``: the counting step of one BPE merge iteration —
  adjacent symbol-pair frequencies over the corpus vocabulary. This is
  the inner loop of tokenizer induction (Sennrich et al., BPE); at
  100 TB you run it once per merge over a (word, count) table, which
  this operator accepts naturally since pair counts are weighted by
  word multiplicity.
- ``bigram_next_word``: the maximum-likelihood next-token table
  (argmax of the bigram conditional), the degenerate-but-useful end of
  the n-gram LM family next to x31's surprisal scorer.

All outputs are integer counts with deterministic tie-breaking, so each
operator certifies hash-exact against an ANSI-SQL twin (x75/x76/x78).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def basket_pair_lift(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
) -> DataFrame:
    """Item pairs co-occurring in a basket, with exact integer lift.

    Output per unordered pair (item_a < item_b, both present in at
    least one common basket, pair count >= min_pair_count):
    item_a, item_b, pair_cnt, cnt_a, cnt_b, n_baskets,
    lift_num = pair_cnt * n_baskets, lift_den = cnt_a * cnt_b
    (lift > 1 ⇔ lift_num > lift_den).

    r14 shape: ONE keyed aggregate condenses each basket to its sorted
    distinct item array; pairs are generated array-locally (bounded by
    basket size², exactly the old keyed self-join's fan-out) and the
    item/basket counts explode the same arrays — so the input is
    grouped once and the three consumer branches all hang off the same
    exchange (ReuseExchange) instead of four scan+distinct subtrees.
    """
    baskets = df.groupBy(F.col(basket_col).alias("__b")).agg(
        F.sort_array(F.collect_set(F.col(item_col))).alias("__items")
    )
    pairs = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(__items, (x, i) ->"
                    " transform(slice(__items, i + 2,"
                    " size(__items) - i - 1),"
                    " y -> struct(x AS item_a, y AS item_b))))"
                )
            ).alias("__p")
        )
        .select("__p.item_a", "__p.item_b")
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= int(min_pair_count))
    )
    item_cnt = (
        baskets.select(F.explode("__items").alias(item_col))
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    totals = baskets.agg(F.count(F.lit(1)).alias("n_baskets"))
    return (
        pairs.join(
            item_cnt.select(
                F.col(item_col).alias("item_a"),
                F.col("__cnt").alias("cnt_a"),
            ),
            "item_a",
        )
        .join(
            item_cnt.select(
                F.col(item_col).alias("item_b"),
                F.col("__cnt").alias("cnt_b"),
            ),
            "item_b",
        )
        .join(F.broadcast(totals))
        .select(
            "item_a",
            "item_b",
            "pair_cnt",
            "cnt_a",
            "cnt_b",
            "n_baskets",
            (F.col("pair_cnt") * F.col("n_baskets")).alias("lift_num"),
            (F.col("cnt_a") * F.col("cnt_b")).alias("lift_den"),
        )
    )


def _words(df: DataFrame, text_col: str):
    """Lowercased alpha words, one row per occurrence (order not kept)."""
    return df.select(
        F.explode(
            F.split(
                F.trim(
                    F.regexp_replace(F.lower(F.col(text_col)), "[^a-z]+", " ")
                ),
                " +",
            )
        ).alias("word")
    ).filter(F.length("word") >= 2)


def char_pair_counts(
    df: DataFrame, text_col: str, top_n: int = 20
) -> DataFrame:
    """Adjacent character-pair frequencies over word occurrences — the
    counting step of one BPE merge. Output top_n rows:
    pair, cnt, rank (1-based by cnt DESC, pair ASC)."""
    pairs = _words(df, text_col).select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1),"
                " i -> substring(word, i, 2))"
            )
        ).alias("pair")
    )
    counted = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("cnt"))
    # orderBy().limit(N) plans as TakeOrderedAndProject (distributed
    # partial top-N); the rank window then runs over the N survivors
    # only — never a single-partition sort of the full distinct-pair
    # table (same fix shape as ngram_lm, r7).
    top = counted.orderBy(F.col("cnt").desc(), F.col("pair")).limit(
        int(top_n)
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("pair"))
    return top.withColumn("rank", F.row_number().over(w))


def bigram_next_word(
    df: DataFrame, text_col: str, top_heads: int = 50
) -> DataFrame:
    """Maximum-likelihood next word for the ``top_heads`` most frequent
    head words. Output: w1, w1_cnt (bigram occurrences headed by w1),
    next_w, next_cnt; ties broken by (cnt DESC, word ASC) everywhere.

    Scale shape: the bigram explode is linear in token count, both
    aggregations are keyed on the word, and the head ranking is over
    the (bounded) distinct-bigram table — no global sort of the corpus.
    """
    words = df.select(
        F.split(
            F.trim(
                F.regexp_replace(F.lower(F.col(text_col)), "[^a-z]+", " ")
            ),
            " +",
        ).alias("ws")
    ).filter(F.size("ws") >= 2)
    bigrams = words.select(
        F.explode(
            F.arrays_zip(
                F.expr("slice(ws, 1, size(ws) - 1)").alias("w1"),
                F.expr("slice(ws, 2, size(ws) - 1)").alias("w2"),
            )
        ).alias("bg")
    ).select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    bg_cnt = bigrams.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("next_cnt")
    )
    head_cnt = bg_cnt.groupBy("w1").agg(F.sum("next_cnt").alias("w1_cnt"))
    w_next = Window.partitionBy("w1").orderBy(
        F.col("next_cnt").desc(), F.col("w2")
    )
    best = (
        bg_cnt.withColumn("__r", F.row_number().over(w_next))
        .filter(F.col("__r") == 1)
        .select("w1", F.col("w2").alias("next_w"), "next_cnt")
    )
    # TakeOrderedAndProject instead of a row_number window: head_cnt is
    # vocabulary-sized, and a global Window.orderBy would sort it on ONE
    # partition. orderBy().limit(N) does a distributed partial top-N;
    # identical rows under the (w1_cnt DESC, w1) total order.
    heads = (
        head_cnt.orderBy(F.col("w1_cnt").desc(), F.col("w1"))
        .limit(int(top_heads))
        .select("w1", "w1_cnt")
    )
    return heads.join(best, "w1").select(
        "w1", "w1_cnt", "next_w", "next_cnt"
    )
