"""BM25 ranked retrieval over a document corpus.

The missing retrieval piece next to the similarity stack: x9/x10/x23
rank by embedding cosine, x32 extracts per-doc TF-IDF keywords — BM25
is the lexical *query -> top-k documents* scorer (Robertson/Sparck
Jones probabilistic model; the default first-stage ranker in Lucene /
Elasticsearch and the standard hard-negative miner for training-data
retrieval pipelines).

    score(q, d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))   (Lucene form, >= 0)

Scale shape (100 TB corpus, Q query terms):
- term frequencies: one (doc, token) hash aggregate — map-side
  combinable, keyed shuffle only;
- document lengths + avgdl: one keyed agg + a 1-row broadcast;
- the query-term table (Q rows, with df/idf attached) is BROADCAST, so
  postings for non-query terms die at the scan-side join filter —
  nothing global ever shuffles on token;
- top-k per term: one window keyed by term.

Floating-point note: idf/score are IEEE doubles; both engines evaluate
the same literal expression tree and the correctness harness rounds to
6 significant digits (precedent: x32's tf*ln(N/df)). Ranking ties are
broken (score DESC, doc_id ASC); equal (tf, dl) pairs give bit-equal
scores in both engines, so the cut is stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

K1_E1 = 12  # k1 = 1.2, kept as integer tenths so SQL literals match
B_E2 = 75   # b = 0.75, integer hundredths


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_terms: int = 5,
    min_token_len: int = 4,
    k: int = 10,
) -> DataFrame:
    """Top-k docs per query term for the ``n_terms`` highest-df tokens
    of length >= ``min_token_len`` (a deterministic, corpus-derived
    query workload: df DESC, token ASC).

    Returns (term, doc_id, tf, score, rank), rank 1..k per term.
    """
    k1 = F.lit(K1_E1) / F.lit(10.0)
    b = F.lit(B_E2) / F.lit(100.0)

    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("token"),
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )

    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    # Top-n_terms of the vocabulary: orderBy+limit plans as
    # TakeOrderedAndProject (per-partition top-N, then a bounded merge)
    # — NOT a single-partition global sort over the whole vocab.
    qterms = (
        dfreq.filter(F.length("token") >= min_token_len)
        .orderBy(F.desc("df"), F.asc("token"))
        .limit(n_terms)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .select(F.col("token").alias("term"), "idf", "avgdl")
    )

    w_t = Window.partitionBy("term").orderBy(
        F.desc("score"), F.asc("doc_id"))
    return (
        tf.join(F.broadcast(qterms), tf.token == qterms.term)
        .join(dl, "doc_id")
        .withColumn(
            "score",
            F.col("idf")
            * (F.col("tf") * (k1 + F.lit(1.0)))
            / (
                F.col("tf")
                + k1 * (F.lit(1.0) - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
        .withColumn("rank", F.row_number().over(w_t))
        .filter(F.col("rank") <= k)
        .select("term", "doc_id", "tf", "score",
                F.col("rank").cast("long").alias("rank"))
    )
