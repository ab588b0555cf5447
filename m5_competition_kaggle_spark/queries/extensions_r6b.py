"""Round-6 extension queries — registered during round 6, certified in
the spare r6 window slots behind the 31 queued r5-built entries.

New modules only (operators/stats_exact.py, scd.py, cooccur.py,
phash.py, asof_ext.py, rolling_distinct.py) — nothing here touches any
banked query's hash closure.

- x73 per-group OLS trend as exact BIGINT sufficient sums + rational
  slope — the drift detector next to q8/q19's rolling means.
- x74 gaps-and-islands SCD2 history: reconstruct attribute validity
  ranges from an append-only event log in ONE keyed window sort.
- x75 market-basket pair lift: keyed a-priori candidate pairs with an
  integer-rational lift against independence.
- x76 BPE merge-step pair counts: the counting inner loop of tokenizer
  induction (Sennrich et al.) over word occurrences.
- x77 quality-aware canonical election: near-dup clusters (x24's
  MinHash->CC machinery) electing the LONGEST member as survivor
  instead of the min-id — the "keep the best copy" curation policy.
- x78 bigram next-word table: the argmax of the bigram conditional for
  the top-50 head words (the ML end of the n-gram LM family, next to
  x31's surprisal).
- x79 normalization-aware dedup: exact dedup AFTER lowercase/
  punctuation-collapse normalization, exposing the near-misses exact
  md5 dedup (x1) cannot see.
- x80 per-group Gini concentration of user activity — the skew
  diagnostic that tells you which aggregation keys need salting
  (operators/skew.py) BEFORE the job falls over.
- x81 perceptual-hash near-dup over decoded asset samples — the
  multimodal dedup flank (operators/phash.py; deterministic fake
  decode documented there).
- x82 forward as-of join with tolerance: next-event attachment
  (first error within an hour of each purchase), the lookahead twin
  of x13's backward as-of.
- x83 winsorized robust aggregate by exact order statistics.
- g20 trailing 7-day exact distinct users via contribution expansion —
  the windowed COUNT(DISTINCT) Spark cannot express natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.asof_ext import (
    asof_join_forward,
)
from m5_competition_kaggle_spark.operators.cooccur import (
    basket_pair_lift,
    bigram_next_word,
    char_pair_counts,
)
from m5_competition_kaggle_spark.operators.phash import phash_near_pairs
from m5_competition_kaggle_spark.operators.rolling_distinct import (
    trailing_distinct_count,
)
from m5_competition_kaggle_spark.operators.scd import change_islands
from m5_competition_kaggle_spark.operators.stats_exact import (
    gini_by_rank,
    group_ols_sums,
    winsorized_sum,
)
from m5_competition_kaggle_spark.sources.catalog import load_table

NANOS_PER_DAY = 86_400_000_000_000
HOUR_NANOS = 3_600_000_000_000

# ----------------------------------------------------------------- queries


def x73_group_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type value drift: exact OLS of milli-quantized value
    against the day index (``operators/stats_exact.py``). One keyed
    aggregate after a broadcast of the 1-row global min-day; the slope
    is an exact BIGINT rational, so the 100 TB plan is a pure
    map-side-combinable GROUP BY."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"ts_nanos DIV {NANOS_PER_DAY}").alias("day"),
        F.floor(F.col("value") * F.lit(1000)).cast("long").alias("y"),
    )
    d0 = ev.agg(F.min("day").alias("d0"))
    xy = ev.join(F.broadcast(d0)).withColumn(
        "x", F.col("day") - F.col("d0")
    )
    return group_ols_sums(xy, "event_type", "x", "y").orderBy("event_type")


def x74_scd2_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 state history from the event log (``operators/scd.py``):
    collapse each sampled user's consecutive same-type runs into
    islands with [valid_from, valid_to) bounds. Events are first
    reduced to one row per (user, nanos) — a keyed aggregate — so the
    island window has a total order; everything rides ONE shuffle on
    user_id."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") % 25 == 0)
        .groupBy("user_id", F.col("ts_nanos").alias("tsn"))
        .agg(F.min("event_type").alias("event_type"))
    )
    return change_islands(ev, "user_id", "tsn", "event_type").orderBy(
        "user_id", "island"
    )


def x75_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 co-occurring part pairs across order baskets with exact
    integer lift (``operators/cooccur.py``). The pair join is keyed on
    the order key (fan-out bounded by basket size), counts are keyed
    aggregates, the basket total is a broadcast 1-row scalar; the final
    top-100 is a distributed TakeOrderedAndProject, with the rank
    window over the 100 survivors only."""
    li = load_table(spark, sf_dir, "lineitem")
    lifted = basket_pair_lift(
        li, "l_orderkey", "l_partkey", min_pair_count=2
    )
    # Distributed partial top-100 (TakeOrderedAndProject) first; the
    # rank window then runs over the 100 survivors only — the
    # qualifying-pair table is corpus-sized at scale and must never be
    # single-partition sorted (r7 ngram_lm fix shape).
    order = [F.col("pair_cnt").desc(), F.col("item_a"), F.col("item_b")]
    top = lifted.orderBy(*order).limit(100)
    w = Window.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w)).orderBy("rank")


def x76_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE merge-step count: top-20 adjacent character pairs over
    word occurrences (``operators/cooccur.py::char_pair_counts``).
    Linear explode, one keyed count; the global rank runs on the
    distinct-pair table (bounded by alphabet², not corpus size)."""
    docs = load_table(spark, sf_dir, "documents")
    return char_pair_counts(docs, "text", top_n=20).orderBy("rank")


def x77_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical election per near-dup cluster: MinHash
    LSH pairs -> connected components (the certified x24 machinery),
    then each cluster elects its LONGEST document (ties to min doc_id)
    via a single min(struct) aggregate — no window over the corpus.
    This is the curation policy that keeps the best copy instead of an
    arbitrary one; output is per-cluster."""
    from m5_competition_kaggle_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from m5_competition_kaggle_spark.operators.graph import dedup_clusters

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=16, bands=4,
        shingle_size=3, threshold=0.8,
    ).select("id_a", "id_b")
    clusters = dedup_clusters(pairs).select("doc_id", "cluster_id")
    joined = clusters.join(
        docs.select("doc_id", "n_chars"), "doc_id"
    )
    return (
        joined.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("n_chars").alias("total_chars"),
            F.min(
                F.struct(
                    (-F.col("n_chars")).alias("neg"),
                    F.col("doc_id").alias("d"),
                )
            ).alias("__c"),
        )
        .select(
            "cluster_id",
            "n_members",
            "total_chars",
            F.col("__c.d").alias("canonical_doc_id"),
            (-F.col("__c.neg")).alias("canonical_chars"),
        )
        .orderBy("cluster_id")
    )


def x78_bigram_next(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum-likelihood next-word table for the 50 most frequent head
    words (``operators/cooccur.py::bigram_next_word``): linear bigram
    explode, keyed counts, per-head argmax by window — the degenerate
    n-gram LM next to x31's surprisal scorer."""
    docs = load_table(spark, sf_dir, "documents")
    return bigram_next_word(docs, "text", top_heads=50).orderBy("w1")


def x79_norm_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalization dedup: group documents by the h64 of their
    BAG-OF-WORDS fingerprint (lowercased, punctuation-collapsed,
    sorted distinct tokens) — word order and repetition drop out, so
    shuffled/stuttered rewrites of the same vocabulary collapse into
    one group, the near-misses exact md5 dedup (x1) cannot see (this
    corpus has ZERO byte-identical texts, yet ~20 fingerprint groups).
    ``n_raw_variants`` counts distinct raw texts per group. One
    hash-groupBy after a per-row array canonicalization — the same
    single-shuffle scale shape as x1."""
    from m5_competition_kaggle_spark.functions.text import h64

    docs = load_table(spark, sf_dir, "documents")
    sig = F.array_join(
        F.array_sort(
            F.array_distinct(
                F.split(
                    F.trim(
                        F.regexp_replace(
                            F.lower(F.col("text")), "[^a-z0-9]+", " "
                        )
                    ),
                    " +",
                )
            )
        ),
        " ",
    )
    return (
        docs.select(
            F.col("doc_id"),
            h64(sig).alias("norm_key"),
            F.md5("text").alias("__raw"),
        )
        .groupBy("norm_key")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("__raw").alias("n_raw_variants"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy("min_doc_id")
    )


def x80_gini_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnostic: per event type, the exact Gini
    concentration of per-user event counts
    (``operators/stats_exact.py::gini_by_rank``) as a BIGINT rational.
    High Gini = a few hot users dominate = that key needs
    ``operators/skew.py`` salting. Cost: one keyed count + one window
    rank per group — O(k log k), never the O(k²) pair formula."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("c")
    )
    return gini_by_rank(counts, "event_type", "c", "user_id").orderBy(
        "event_type"
    )


def x81_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-dup pairs within each source
    (``operators/phash.py``): deterministic fake decode -> 15-bit
    aHash -> 3-band LSH keyed join (exact for Hamming <= 2 by
    pigeonhole) -> popcount verify. The multimodal dedup flank; a real
    codec drops in at the sample expression without changing the
    plan shape."""
    docs = load_table(spark, sf_dir, "documents")
    return phash_near_pairs(
        docs, "doc_id", "text", max_hamming=2, partition_cols=("source",)
    ).orderBy("id_a", "id_b")


def x82_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of with tolerance (``operators/asof_ext.py``): attach
    to every purchase the FIRST error event of the same user within
    one hour. One union + one window sort on user_id — O(|L|+|R|),
    no inequality join."""
    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts_nanos").alias("tsn")
    )
    right = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", F.col("ts_nanos").alias("tsn"))
        .agg(F.min("value").alias("next_value"))
    )
    return asof_join_forward(
        left,
        right,
        on=["user_id"],
        ts_col="tsn",
        value_cols=["next_value"],
        tolerance=HOUR_NANOS,
    ).orderBy("event_id")


def x83_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized aggregate per event type: clamp the bottom/top tenth
    (by exact order statistics) before summing — the robust mean that
    one corrupt meter reading cannot move. One shuffle per group
    (rank, clamp bounds, and sum share the same window sort);
    milli-quantized integers end to end."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * F.lit(1000)).cast("long").alias("v"),
        "event_id",
    )
    return winsorized_sum(
        ev, "event_type", "v", "event_id", tail_denominator=10
    ).orderBy("event_type")


def g20_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day exact distinct users per observed day
    (``operators/rolling_distinct.py``): contribution expansion turns
    the unsupported windowed COUNT(DISTINCT) into two keyed aggregates
    with a bounded ×7 explode on the collapsed (user, day) table."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr(f"ts_nanos DIV {NANOS_PER_DAY}").alias("day")
    )
    return (
        trailing_distinct_count(ev, "user_id", "day", window_n=7)
        .orderBy("period")
    )


QUERIES = {
    "x73_group_ols": x73_group_ols,
    "x74_scd2_islands": x74_scd2_islands,
    "x75_basket_lift": x75_basket_lift,
    "x76_bpe_pairs": x76_bpe_pairs,
    "x77_cluster_canonical": x77_cluster_canonical,
    "x78_bigram_next": x78_bigram_next,
    "x79_norm_dedup": x79_norm_dedup,
    "x80_gini_skew": x80_gini_skew,
    "x81_phash_neardup": x81_phash_neardup,
    "x82_asof_forward": x82_asof_forward,
    "x83_winsorized_mean": x83_winsorized_mean,
    "g20_rolling_distinct": g20_rolling_distinct,
}

# ----------------------------------------------------------------- oracles

_H64 = "CAST('0x' || substr(md5({s}), 1, 15) AS BIGINT)"

ORACLES: dict[str, str] = {}

ORACLES["x73_group_ols"] = f"""
WITH ev AS (SELECT event_type,
                   epoch_ns(ts) // {NANOS_PER_DAY} AS day,
                   CAST(FLOOR(value * 1000) AS BIGINT) AS y
            FROM events),
m AS (SELECT min(day) AS d0 FROM ev),
xy AS (SELECT event_type, day - d0 AS x, y FROM ev CROSS JOIN m),
s AS (SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM xy GROUP BY event_type)
SELECT event_type, n, sx, sy, sxx, sxy,
       n * sxy - sx * sy AS slope_num,
       n * sxx - sx * sx AS slope_den
FROM s ORDER BY event_type
"""

ORACLES["x74_scd2_islands"] = """
WITH ev0 AS (SELECT user_id, epoch_ns(ts) AS tsn,
                    min(event_type) AS event_type
             FROM events WHERE user_id % 25 = 0 GROUP BY 1, 2),
flg AS (SELECT user_id, tsn, event_type,
               CASE WHEN lag(event_type) OVER w IS NULL
                         OR lag(event_type) OVER w <> event_type
                    THEN 1 ELSE 0 END AS chg
        FROM ev0 WINDOW w AS (PARTITION BY user_id ORDER BY tsn)),
isl AS (SELECT user_id, tsn, event_type,
               CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY tsn
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS island
        FROM flg),
grp AS (SELECT user_id, island, min(event_type) AS event_type,
               CAST(count(*) AS BIGINT) AS n_rows,
               min(tsn) AS valid_from
        FROM isl GROUP BY 1, 2)
SELECT user_id, island, event_type, n_rows, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY island)
           AS valid_to
FROM grp ORDER BY user_id, island
"""

ORACLES["x75_basket_lift"] = """
WITH present AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS item
                 FROM lineitem),
pairs AS (SELECT a.item AS item_a, b.item AS item_b,
                 CAST(count(*) AS BIGINT) AS pair_cnt
          FROM present a JOIN present b
            ON a.b = b.b AND a.item < b.item
          GROUP BY 1, 2 HAVING count(*) >= 2),
ic AS (SELECT item, CAST(count(*) AS BIGINT) AS cnt
       FROM present GROUP BY 1),
tot AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS n_baskets
        FROM present),
ranked AS (SELECT p.item_a, p.item_b, p.pair_cnt,
                  ia.cnt AS cnt_a, ib.cnt AS cnt_b, t.n_baskets,
                  p.pair_cnt * t.n_baskets AS lift_num,
                  ia.cnt * ib.cnt AS lift_den,
                  row_number() OVER (ORDER BY p.pair_cnt DESC,
                                     p.item_a, p.item_b) AS rank
           FROM pairs p
           JOIN ic ia ON ia.item = p.item_a
           JOIN ic ib ON ib.item = p.item_b
           CROSS JOIN tot t)
SELECT item_a, item_b, pair_cnt, cnt_a, cnt_b, n_baskets,
       lift_num, lift_den, rank
FROM ranked WHERE rank <= 100 ORDER BY rank
"""

ORACLES["x76_bpe_pairs"] = """
WITH w0 AS (SELECT regexp_replace(lower(text), '[^a-z]+', ' ', 'g')
                AS t FROM documents),
words AS (SELECT unnest(str_split_regex(trim(t), ' +')) AS word
          FROM w0),
wf AS (SELECT word FROM words WHERE length(word) >= 2),
prs AS (SELECT substr(word, CAST(i AS INT), 2) AS pair
        FROM (SELECT word, unnest(range(1, length(word))) AS i
              FROM wf)),
cnt AS (SELECT pair, CAST(count(*) AS BIGINT) AS cnt
        FROM prs GROUP BY 1),
r AS (SELECT pair, cnt,
             row_number() OVER (ORDER BY cnt DESC, pair) AS rank
      FROM cnt)
SELECT pair, cnt, rank FROM r WHERE rank <= 20 ORDER BY rank
"""


def _cluster_canonical_oracle() -> str:
    from m5_competition_kaggle_spark.queries.extensions import (
        _minhash_verified_ctes,
    )

    return f"""
WITH RECURSIVE {_minhash_verified_ctes(16, 4)},
vpairs AS (SELECT id_a, id_b FROM vstats WHERE jaccard >= 0.8),
edges AS (SELECT id_a AS a, id_b AS b FROM vpairs
          UNION SELECT id_b, id_a FROM vpairs),
reach(node, reached) AS (
    SELECT a, a FROM edges
    UNION
    SELECT r.node, e.b FROM reach r JOIN edges e ON e.a = r.reached
),
comp AS (SELECT node, min(reached) AS cluster_id FROM reach GROUP BY node),
j AS (SELECT c.node AS doc_id, c.cluster_id, d.n_chars
      FROM comp c JOIN documents d ON d.doc_id = c.node),
can AS (SELECT cluster_id, doc_id AS canonical_doc_id,
               n_chars AS canonical_chars
        FROM (SELECT *, row_number() OVER (PARTITION BY cluster_id
                           ORDER BY n_chars DESC, doc_id) AS r
              FROM j)
        WHERE r = 1),
g AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members,
             CAST(sum(n_chars) AS BIGINT) AS total_chars
      FROM j GROUP BY cluster_id)
SELECT g.cluster_id, g.n_members, g.total_chars,
       can.canonical_doc_id, can.canonical_chars
FROM g JOIN can USING (cluster_id)
ORDER BY cluster_id
"""


ORACLES["x77_cluster_canonical"] = _cluster_canonical_oracle()

ORACLES["x78_bigram_next"] = """
WITH w0 AS (SELECT str_split_regex(trim(regexp_replace(lower(text),
                       '[^a-z]+', ' ', 'g')), ' +') AS ws
            FROM documents),
wl AS (SELECT ws FROM w0 WHERE len(ws) >= 2),
bg AS (SELECT ws[CAST(i AS INT)] AS w1, ws[CAST(i AS INT) + 1] AS w2
       FROM (SELECT ws, unnest(range(1, len(ws))) AS i FROM wl)),
bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS next_cnt
       FROM bg GROUP BY 1, 2),
hc AS (SELECT w1, CAST(sum(next_cnt) AS BIGINT) AS w1_cnt
       FROM bc GROUP BY 1),
best AS (SELECT w1, w2 AS next_w, next_cnt
         FROM (SELECT *, row_number() OVER (PARTITION BY w1
                             ORDER BY next_cnt DESC, w2) AS r
               FROM bc)
         WHERE r = 1),
heads AS (SELECT w1, w1_cnt
          FROM (SELECT *, row_number() OVER (ORDER BY w1_cnt DESC, w1)
                       AS hr
                FROM hc)
          WHERE hr <= 50)
SELECT h.w1, h.w1_cnt, b.next_w, b.next_cnt
FROM heads h JOIN best b USING (w1) ORDER BY w1
"""

_NORM_SIG = (
    "array_to_string(list_sort(list_distinct(str_split_regex("
    "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')),"
    " ' +'))), ' ')"
)

ORACLES["x79_norm_dedup"] = f"""
WITH n AS (SELECT doc_id,
                  {_H64.format(s=_NORM_SIG)}
                      AS norm_key,
                  md5(text) AS raw
           FROM documents)
SELECT norm_key,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT raw) AS BIGINT) AS n_raw_variants,
       min(doc_id) AS min_doc_id
FROM n GROUP BY norm_key HAVING count(*) >= 2
ORDER BY min_doc_id
"""

ORACLES["x80_gini_skew"] = """
WITH c AS (SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS v
           FROM events GROUP BY 1, 2),
rk AS (SELECT event_type, v,
              CAST(row_number() OVER (PARTITION BY event_type
                        ORDER BY v, user_id) AS BIGINT) AS i
       FROM c),
s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS k,
             CAST(sum(v) AS BIGINT) AS sum_v,
             CAST(sum(i * v) AS BIGINT) AS siv
      FROM rk GROUP BY event_type)
SELECT event_type, k, sum_v,
       2 * siv - (k + 1) * sum_v AS gini_num,
       k * sum_v AS gini_den
FROM s ORDER BY event_type
"""


def _phash_oracle() -> str:
    n = 15
    nibs = ", ".join(
        f"(h // {16 ** (n - 1 - j)}) % 16 AS p{j}" for j in range(n)
    )
    s = " + ".join(f"p{j}" for j in range(n))
    bits = " + ".join(
        f"CASE WHEN {n} * p{j} > s THEN {2 ** j} ELSE 0 END"
        for j in range(n)
    )
    return f"""
WITH h0 AS (SELECT doc_id, source,
                   {_H64.format(s='text')} AS h
            FROM documents),
nib AS (SELECT doc_id, source, {nibs} FROM h0),
sm AS (SELECT *, {s} AS s FROM nib),
ph AS (SELECT doc_id, source, CAST({bits} AS BIGINT) AS phash FROM sm)
SELECT a.source, a.doc_id AS id_a, b.doc_id AS id_b,
       a.phash AS hash_a, b.phash AS hash_b,
       CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
FROM ph a JOIN ph b ON a.source = b.source AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.phash, b.phash)) <= 2
ORDER BY id_a, id_b
"""


ORACLES["x81_phash_neardup"] = _phash_oracle()

ORACLES["x82_asof_forward"] = f"""
WITH l AS (SELECT event_id, user_id, epoch_ns(ts) AS tsn
           FROM events WHERE event_type = 'purchase'),
r0 AS (SELECT user_id, epoch_ns(ts) AS tsn, min(value) AS next_value
       FROM events WHERE event_type = 'error' GROUP BY 1, 2),
cand AS (SELECT l.event_id, min(r.tsn) AS m
         FROM l JOIN r0 r
           ON r.user_id = l.user_id AND r.tsn >= l.tsn
         GROUP BY 1)
SELECT l.event_id AS event_id, l.user_id AS user_id, l.tsn AS tsn,
       CASE WHEN c.m <= l.tsn + {HOUR_NANOS} THEN c.m END AS matched_ts,
       CASE WHEN c.m <= l.tsn + {HOUR_NANOS} THEN r.next_value END
           AS next_value
FROM l
LEFT JOIN cand c ON c.event_id = l.event_id
LEFT JOIN r0 r ON r.user_id = l.user_id AND r.tsn = c.m
ORDER BY l.event_id
"""

ORACLES["x83_winsorized_mean"] = """
WITH ev AS (SELECT event_type,
                   CAST(FLOOR(value * 1000) AS BIGINT) AS v,
                   event_id
            FROM events),
rk AS (SELECT event_type, v,
              CAST(row_number() OVER (PARTITION BY event_type
                        ORDER BY v, event_id) AS BIGINT) AS r,
              CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
                  AS n
       FROM ev),
cu AS (SELECT *, n // 10 AS cut FROM rk),
cl AS (SELECT *,
              max(CASE WHEN r = cut + 1 THEN v END)
                  OVER (PARTITION BY event_type) AS lo_v,
              max(CASE WHEN r = n - cut THEN v END)
                  OVER (PARTITION BY event_type) AS hi_v
       FROM cu)
SELECT event_type,
       CAST(max(n) AS BIGINT) AS n,
       CAST(max(cut) AS BIGINT) AS cut,
       max(lo_v) AS lo_v,
       max(hi_v) AS hi_v,
       CAST(sum(CASE WHEN v < lo_v THEN lo_v
                     WHEN v > hi_v THEN hi_v
                     ELSE v END) AS BIGINT) AS wsum
FROM cl GROUP BY event_type ORDER BY event_type
"""

ORACLES["g20_rolling_distinct"] = f"""
WITH obs AS (SELECT DISTINCT user_id,
                    epoch_ns(ts) // {NANOS_PER_DAY} AS day
             FROM events),
contrib AS (SELECT user_id, day + i AS period
            FROM obs CROSS JOIN (SELECT unnest(range(0, 7)) AS i)),
cnt AS (SELECT period, CAST(count(DISTINCT user_id) AS BIGINT) AS uniq
        FROM contrib GROUP BY 1),
days AS (SELECT DISTINCT epoch_ns(ts) // {NANOS_PER_DAY} AS period
         FROM events)
SELECT c.period, c.uniq FROM cnt c JOIN days USING (period)
ORDER BY period
"""
