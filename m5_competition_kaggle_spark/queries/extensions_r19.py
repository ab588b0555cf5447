"""Round-19 queue — STAGED UNREGISTERED, seven rounds ahead (r13–r18
queues are staged; see queries/__init__.py). Locally certified by
``tests/test_r19_queue.py`` with the same Spark-vs-DuckDB differential
as ``scripts/check_oracle.py``.

- x191 Zipf slope: the frequency–rank twin of x167's Heaps exponent —
  Theil–Sen slope of L(count) vs L(rank) over power-of-two rank
  checkpoints of the top-512 tokens (≈ −10⁶ for natural language;
  shallow means templated/boilerplate text). Vocabulary reduces by
  TakeOrdered before any bounded single-partition work (x167's
  allowance class). HONEST FIXTURE FINDING: the synthetic corpus
  draws from a 31-word near-uniform vocabulary, so only 5
  checkpoints exist and the certified slope is ≈ −0.02·10⁶ — the
  metric correctly reading "templated text", the exact opposite end
  of the scale from natural language.
- x192 implication matrix: x185's followed-by generalized to EVERY
  ordered event-type pair (diagonal included — "another of the same
  within 30 min" reads burstiness): n_a, n_followed, rate ppm per
  (a, b). The full temporal-grammar heatmap; g18's transition matrix
  counts only the IMMEDIATE next event, this counts any-within-Δ.
- x193 user growth: the acquisition curve — first-seen users per day
  and the exact running total (calendar-bounded cumulative window,
  the x124 allowance class). g13's cohort matrix slices retention;
  this is the top-line the cohorts hang from.
- x194 langid confusion: x8's stopword-marker language prediction
  scored against the fixture's lang GROUND TRUTH — confusion cells
  with per-true-language totals and floor-ppm shares. The accuracy
  audit that turns a heuristic into a measured component. HONEST
  FIXTURE FINDING: the 31-word synthetic vocabulary contains none of
  the natural-language stopword markers, so every score is 0 and the
  tie-break sends every document to 'en' — the confusion matrix is
  exactly the artifact that EXPOSES an untriggerable heuristic, which
  is its job.
- x202 FORCAST readability (added r13 second session): per-source
  integer milli-grade readability from the monosyllabic-word share —
  the one classic formula defined WITHOUT sentence boundaries (which
  the fixture genuinely lacks), all per-doc work in JVM higher-order
  array functions; syllables = [aeiou]+ vowel-group runs floored
  at 1, hand-syllabified pins.
- x209 fact consistency (added r13 second session): does
  o_totalprice equal Σ extendedprice·(1−discount)? Per-line integer
  CENTS quantization before any sum (doubles never sum), deviation
  ppm per order, capped whole-percent cells for the rank math.
  HONEST FIXTURE FINDING: the generator draws o_totalprice
  independently of lineitems — zero orders reconcile, the audit
  correctly reading a fictional rollup column.
- x216 Benford digits (added r14): first-significant-digit shares
  of integer-cents event values vs Benford's log10(1+1/d) ppm
  literals, zero-filled |types|·9 grid with an exact
  total-variation distance per type — the fabricated-data /
  unit-mixing instrument beside x209; the bounded fixture honestly
  reads far from Benford, pinned beside a planted log-uniform
  corpus that reads close.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from m5_competition_kaggle_spark.sources.catalog import load_table

NANOS_PER_DAY = 86_400_000_000_000
FOLLOW_NS = 30 * 60 * 1_000_000_000
LOG_Q = 1_000_000
ZIPF_TOP = 512
ZIPF_RANKS = tuple(2 ** k for k in range(10))  # 1, 2, 4, ..., 512

# --------------------------------------------------------------- x191


def x191_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf exponent of the token frequency–rank curve: exact counts
    (x30 token rule), rank by (count DESC, token) — a total order —
    over the TakeOrdered top-512, log-quantized checkpoints at ranks
    1,2,4,...,512 through the x153 Theil–Sen kernel. The rank window
    runs on the 512-row bounded table (justified PLAN_AUDIT
    allowance, the x167 class); slope_ppm ≈ −10⁶ is the natural-
    language line."""
    from m5_competition_kaggle_spark.operators.theil_sen import (
        theil_sen_slope,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        F.explode(
            F.expr(
                "filter(split(lower(text), '[^a-z0-9]+'),"
                " x -> x <> '')"
            )
        ).alias("w")
    )
    counts = docs.groupBy("w").agg(
        F.count(F.lit(1)).alias("c")
    )
    top = counts.orderBy(F.col("c").desc(), "w").limit(ZIPF_TOP)
    w_rank = Window.orderBy(F.col("c").desc(), F.col("w").asc())
    ranked = top.withColumn(
        "rank", F.row_number().over(w_rank).cast("long")
    )
    pts = ranked.filter(
        F.col("rank").isin(*ZIPF_RANKS)
    ).select(
        F.lit("corpus").alias("corpus"),
        F.expr(
            f"CAST(round(ln(rank) * {LOG_Q}) AS BIGINT)"
        ).alias("lt"),
        F.expr(
            f"CAST(round(ln(c) * {LOG_Q}) AS BIGINT)"
        ).alias("ly"),
    )
    return theil_sen_slope(pts, "corpus", "lt", "ly")


_RANK_LIST = ", ".join(str(r) for r in ZIPF_RANKS)

ORACLE_X191 = f"""
WITH tok AS (
    SELECT unnest(list_filter(regexp_split_to_array(lower(text),
                                                    '[^a-z0-9]+'),
                              x -> x <> '')) AS w
    FROM documents
),
counts AS (
    SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY w
),
ranked AS (
    SELECT c,
           row_number() OVER (ORDER BY c DESC, w ASC) AS rank
    FROM counts
),
pts AS (
    SELECT CAST(round(ln(rank) * {LOG_Q}) AS BIGINT) AS lt,
           CAST(round(ln(c) * {LOG_Q}) AS BIGINT) AS ly
    FROM ranked WHERE rank IN ({_RANK_LIST})
),
pairs AS (
    SELECT a.lt AS ti, b.lt AS tj,
           b.ly - a.ly AS dy, b.lt - a.lt AS dx
    FROM pts a JOIN pts b ON a.lt < b.lt
),
rk AS (
    SELECT dy, dx,
           row_number() OVER (
               ORDER BY CAST(dy AS DOUBLE) / CAST(dx AS DOUBLE) ASC,
                        ti ASC, tj ASC
           ) AS r,
           CAST(count(*) OVER () AS BIGINT) AS n_pairs
    FROM pairs
),
n_pts AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pts)
SELECT 'corpus' AS corpus, p.n AS n, r.n_pairs AS n_pairs,
       r.dy AS slope_num, r.dx AS slope_den,
       CASE WHEN r.dy >= 0 THEN 1000000 * r.dy // r.dx
            ELSE -((1000000 * (-r.dy)) // r.dx) END AS slope_ppm
FROM n_pts p CROSS JOIN rk r
WHERE r.r = (r.n_pairs + 1) // 2
"""

# --------------------------------------------------------------- x192


def x192_implication_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Full temporal-implication heatmap: for every ORDERED type pair
    (a, b) — diagonal included — the share of a-events followed by a
    DIFFERENT b-event from the same user within 30 minutes (strictly
    after, edge-inclusive, the x185 semantics). One user-keyed band
    join, fanout bounded per user by in-band density; the 25-cell
    matrix assembles through two keyed aggregates."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.select(
        "user_id",
        F.col("event_id").alias("aid"),
        F.col("event_type").alias("ta"),
        F.col("ts_nanos").alias("at"),
    )
    b = ev.select(
        F.col("user_id").alias("b_user"),
        F.col("event_id").alias("bid"),
        F.col("event_type").alias("tb"),
        F.col("ts_nanos").alias("bt"),
    )
    followed = (
        a.join(
            b,
            (F.col("user_id") == F.col("b_user"))
            & (F.col("bt") > F.col("at"))
            & (F.col("bt") <= F.col("at") + F.lit(FOLLOW_NS))
            & (F.col("bid") != F.col("aid")),
        )
        .select("aid", "ta", "tb")
        .distinct()
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).cast("long").alias("n_followed"))
    )
    totals = ev.groupBy(
        F.col("event_type").alias("ta")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_a"))
    types = totals.select("ta")
    grid = types.crossJoin(
        types.select(F.col("ta").alias("tb"))
    )
    return (
        grid.join(totals, "ta")
        .join(followed, ["ta", "tb"], "left")
        .select(
            F.col("ta").alias("type_a"),
            F.col("tb").alias("type_b"),
            "n_a",
            F.coalesce("n_followed", F.lit(0)).alias("n_followed"),
            F.expr(
                "(1000000 * coalesce(n_followed, 0)) DIV n_a"
            ).alias("rate_ppm"),
        )
        .orderBy("type_a", "type_b")
    )


ORACLE_X192 = f"""
WITH ev AS (
    SELECT user_id, event_id, event_type, epoch_ns(ts) AS tsn
    FROM events
),
followed AS (
    SELECT a.event_type AS ta, b.event_type AS tb,
           CAST(count(DISTINCT a.event_id) AS BIGINT) AS n_followed
    FROM ev a JOIN ev b
      ON b.user_id = a.user_id
     AND b.tsn > a.tsn AND b.tsn <= a.tsn + {FOLLOW_NS}
     AND b.event_id <> a.event_id
    GROUP BY 1, 2
),
totals AS (
    SELECT event_type AS ta, CAST(count(*) AS BIGINT) AS n_a
    FROM ev GROUP BY 1
),
grid AS (
    SELECT a.ta, b.ta AS tb FROM totals a CROSS JOIN totals b
)
SELECT g.ta AS type_a, g.tb AS type_b, t.n_a,
       coalesce(f.n_followed, 0) AS n_followed,
       (1000000 * coalesce(f.n_followed, 0)) // t.n_a AS rate_ppm
FROM grid g
JOIN totals t ON t.ta = g.ta
LEFT JOIN followed f ON f.ta = g.ta AND f.tb = g.tb
ORDER BY type_a, type_b
"""

# --------------------------------------------------------------- x193


def x193_user_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The acquisition curve: first-seen users per event-time day and
    the exact running total. The cumulative window walks the
    calendar-bounded day table (x124 allowance class) AFTER the keyed
    per-user first-seen aggregate reduces the corpus."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min("ts_nanos").alias("f")
    )
    daily = firsts.groupBy(
        F.expr(f"f DIV {NANOS_PER_DAY}").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_new_users"))
    w_cum = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        daily.withColumn(
            "n_cum_users", F.sum("n_new_users").over(w_cum)
        )
        .orderBy("day")
    )


ORACLE_X193 = f"""
WITH firsts AS (
    SELECT user_id, min(epoch_ns(ts)) AS f
    FROM events GROUP BY user_id
),
daily AS (
    SELECT f // {NANOS_PER_DAY} AS day,
           CAST(count(*) AS BIGINT) AS n_new_users
    FROM firsts GROUP BY day
)
SELECT day, n_new_users,
       CAST(sum(n_new_users) OVER (ORDER BY day
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_cum_users
FROM daily ORDER BY day
"""

# --------------------------------------------------------------- x194


def x194_langid_confusion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """x8's marker-ratio language prediction vs the lang ground
    truth: confusion cells (true, pred, n) with per-true totals and
    floor-ppm shares — the diagonal ppm IS the per-language recall.
    Reuses the certified `functions/text.with_lang_scores` verbatim;
    the confusion aggregate is two keyed shuffles."""
    from m5_competition_kaggle_spark.functions.text import (
        with_lang_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    scored = with_lang_scores(docs, "text").select(
        F.col("lang").alias("true_lang"), "pred_lang"
    )
    cells = scored.groupBy("true_lang", "pred_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    totals = cells.groupBy("true_lang").agg(
        F.sum("n").alias("n_true")
    )
    return (
        cells.join(totals, "true_lang")
        .select(
            "true_lang",
            "pred_lang",
            "n",
            "n_true",
            F.expr("(1000000 * n) DIV n_true").alias("share_ppm"),
        )
        .orderBy("true_lang", "pred_lang")
    )


def _langid_confusion_oracle() -> str:
    from m5_competition_kaggle_spark.functions.text import (
        LANG_MARKERS,
        LANG_ORDER,
    )
    from m5_competition_kaggle_spark.queries.extensions import (
        _DOCS_TOKS,
    )

    scores = ",\n       ".join(
        "len(list_filter(toks, x -> x IN ({lst}))) * 1.0"
        " / greatest(len(toks), 1) AS score_{lang}".format(
            lst=", ".join(f"'{m}'" for m in LANG_MARKERS[lang]),
            lang=lang,
        )
        for lang in LANG_ORDER
    )
    branches = []
    for idx in range(len(LANG_ORDER) - 1, 0, -1):
        lang = LANG_ORDER[idx]
        earlier = ", ".join(f"score_{lg}" for lg in LANG_ORDER[:idx])
        gt = f"greatest({earlier})" if idx > 1 else earlier
        branches.append(f"WHEN score_{lang} > {gt} THEN '{lang}'")
    case = (
        "CASE " + " ".join(branches) + f" ELSE '{LANG_ORDER[0]}' END"
    )
    return f"""
WITH {_DOCS_TOKS},
s AS (SELECT doc_id,
       {scores}
      FROM docs),
pred AS (
    SELECT d.lang AS true_lang, {case} AS pred_lang
    FROM s JOIN documents d ON d.doc_id = s.doc_id
),
cells AS (
    SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n
    FROM pred GROUP BY true_lang, pred_lang
),
totals AS (
    SELECT true_lang, CAST(sum(n) AS BIGINT) AS n_true
    FROM cells GROUP BY true_lang
)
SELECT c.true_lang, c.pred_lang, c.n, t.n_true,
       (1000000 * c.n) // t.n_true AS share_ppm
FROM cells c JOIN totals t ON t.true_lang = c.true_lang
ORDER BY c.true_lang, c.pred_lang
"""


# --------------------------------------------------------------- x202


def x202_readability_forcast(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source FORCAST readability profile in exact integer
    milli-grades. FORCAST (Caylor et al. 1973) grades text from the
    monosyllabic-word share alone — grade = 20 − mono_per_150_words/10
    — which makes it the ONE classic readability formula defined for
    non-prose text (labels, logs, technical fragments: exactly what a
    crawl corpus is full of, and what Flesch/Kincaid cannot score
    without sentence boundaries the synthetic fixture genuinely lacks).

    Integer form, per scored doc (n_words ≥ 1):
    ``grade_milli = 20000 − (15000·n_mono) DIV n_words`` ∈
    [5000, 20000] (all operands nonnegative: truncating DIV and
    floor-// agree, no sign-split needed). Syllables per token are
    vowel-group runs ``[aeiou]+`` floored at 1 — the deterministic
    from-scratch counter both engines reproduce (the x8/x25 regex
    parity class); tokens follow the x30/x188 ``[^a-z0-9]+``
    lowercase split.

    All per-doc arithmetic stays JVM-side in higher-order array
    functions (transform/aggregate/filter — no UDF, no explode: one
    projection then one keyed aggregate per source). syll_per_word_ppm
    adds the corpus-mixing signal (token complexity drift between
    sources) beside the x6-family quality scores.

    Reference parity: no text metrics in the reference; engine
    extension (SURVEY §2 text-analysis family beside x5–x8).
    """
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "source",
        F.expr(
            "filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')"
        ).alias("__toks"),
    ).select(
        "source",
        F.expr("CAST(size(__toks) AS BIGINT)").alias("n_words"),
        F.expr(
            "aggregate(transform(__toks, x -> greatest(1L,"
            " CAST(size(regexp_extract_all(x, '[aeiou]+', 0))"
            " AS BIGINT))), 0L, (acc, s) -> acc + s)"
        ).alias("n_syll"),
        F.expr(
            "CAST(size(filter(transform(__toks, x -> greatest(1L,"
            " CAST(size(regexp_extract_all(x, '[aeiou]+', 0))"
            " AS BIGINT))), s -> s = 1)) AS BIGINT)"
        ).alias("n_mono"),
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("n_words") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_scored"),
            F.sum("n_words").alias("sum_words"),
            F.sum("n_syll").alias("sum_syll"),
            F.sum("n_mono").alias("sum_mono"),
            F.sum(
                F.when(
                    F.col("n_words") > 0,
                    F.lit(20000)
                    - F.expr("(15000 * n_mono) DIV n_words"),
                )
            ).alias("__grade_sum"),
        )
        .select(
            "source",
            "n_docs",
            "n_scored",
            "sum_words",
            "sum_syll",
            "sum_mono",
            F.expr(
                "CASE WHEN sum_words > 0 THEN"
                " (1000000 * sum_syll) DIV sum_words END"
            ).alias("syll_per_word_ppm"),
            F.expr(
                "CASE WHEN n_scored > 0 THEN"
                " __grade_sum DIV n_scored END"
            ).alias("mean_grade_milli"),
        )
        .orderBy("source")
    )


ORACLE_X202 = """
WITH dt AS (
    SELECT source,
           list_transform(
               list_filter(regexp_split_to_array(lower(text),
                                                 '[^a-z0-9]+'),
                           x -> x <> ''),
               x -> greatest(1, len(regexp_extract_all(x,
                                                       '[aeiou]+')))
           ) AS sylls
    FROM documents
), per_doc AS (
    SELECT source,
           CAST(len(sylls) AS BIGINT) AS n_words,
           CAST(coalesce(list_sum(sylls), 0) AS BIGINT) AS n_syll,
           CAST(len(list_filter(sylls, s -> s = 1)) AS BIGINT)
               AS n_mono
    FROM dt
), agg AS (
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n_words > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_scored,
           CAST(sum(n_words) AS BIGINT) AS sum_words,
           CAST(sum(n_syll) AS BIGINT) AS sum_syll,
           CAST(sum(n_mono) AS BIGINT) AS sum_mono,
           CAST(sum(CASE WHEN n_words > 0 THEN
                    20000 - (15000 * n_mono) // n_words END)
                AS BIGINT) AS grade_sum
    FROM per_doc GROUP BY source
)
SELECT source, n_docs, n_scored, sum_words, sum_syll, sum_mono,
       CASE WHEN sum_words > 0 THEN
           (1000000 * sum_syll) // sum_words END
           AS syll_per_word_ppm,
       CASE WHEN n_scored > 0 THEN grade_sum // n_scored END
           AS mean_grade_milli
FROM agg ORDER BY source
"""


# --------------------------------------------------------------- x209

DEV_CAP_PCT = 1000  # deviations >= 10x the total all land in one cell


def x209_fact_consistency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-table reconciliation audit: does the denormalized
    ``o_totalprice`` equal the lineitem-level value Σ extendedprice ·
    (1 − discount)? The referential-VALUE check (x204 audits key
    overlap; this audits the money) every warehouse runs before
    trusting a rollup column at 100 TB.

    Float discipline: doubles sum order-dependently, so nothing here
    sums a double — each line quantizes to integer cents FIRST
    (``round(x·100)`` per row, deterministic in both engines), cents
    sum exactly in BIGINT, and the per-order relative deviation is
    integer ppm. Deviations then floor into whole-percent cells
    CAPPED at {cap} (≥10× the total is one cell), so the value-at-
    rank cumulative window walks ≤ {cap}+1 rows by construction at
    any corpus size — the x124 allowance via an explicit bound, NOT
    the calendar.

    Orders with no lineitems reconcile against an empty sum (cents 0
    → deviation = 100% of total → the cap cell). HONEST FIXTURE
    FINDING: the synthetic generator draws o_totalprice independently
    of its lineitems, so ZERO orders reconcile and the p50 deviation
    sits in the hundreds of percent — the audit correctly reading a
    rollup column that is, in this corpus, fiction.

    Reference parity: engine extension (SURVEY §2 relational-audit
    family beside x204).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"),
        F.expr(
            "CAST(round(l_extendedprice * (1 - l_discount) * 100)"
            " AS BIGINT)"
        ).alias("cents"),
    )
    sums = li.groupBy("okey").agg(F.sum("cents").alias("line_cents"))
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias(
            "total_cents"
        ),
    )
    dev = orders.join(sums, "okey", "left").select(
        F.expr(
            "CASE WHEN total_cents > 0 THEN"
            " (1000000 * abs(total_cents - coalesce(line_cents, 0)))"
            " DIV total_cents END"
        ).alias("dev_ppm")
    ).filter(F.col("dev_ppm").isNotNull())
    binned = dev.select(
        F.expr(
            f"least(dev_ppm DIV 10000, {DEV_CAP_PCT})"
        ).alias("dev_pct"),
        "dev_ppm",
    )
    tot = binned.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(F.col("dev_ppm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_exact"),
        F.sum(F.when(F.col("dev_ppm") <= 10_000, 1).otherwise(0))
        .cast("long")
        .alias("n_within_1pct"),
        F.sum(F.when(F.col("dev_ppm") <= 100_000, 1).otherwise(0))
        .cast("long")
        .alias("n_within_10pct"),
        F.max("dev_pct").alias("max_dev_pct"),
    )
    cells = binned.groupBy("dev_pct").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w_cum = Window.orderBy("dev_pct").rowsBetween(
        Window.unboundedPreceding, 0
    )
    scored = cells.withColumn(
        "cum", F.sum("c").over(w_cum)
    ).withColumn("n", F.sum("c").over(Window.partitionBy()))
    qs = scored.agg(
        F.min(
            F.when(
                F.col("cum") >= F.expr("(n * 50 + 99) DIV 100"),
                F.col("dev_pct"),
            )
        ).alias("p50_dev_pct"),
        F.min(
            F.when(
                F.col("cum") >= F.expr("(n * 90 + 99) DIV 100"),
                F.col("dev_pct"),
            )
        ).alias("p90_dev_pct"),
    )
    return tot.crossJoin(qs).select(
        "n_orders", "n_exact", "n_within_1pct", "n_within_10pct",
        "p50_dev_pct", "p90_dev_pct", "max_dev_pct",
    )


x209_fact_consistency.__doc__ = x209_fact_consistency.__doc__.format(
    cap=DEV_CAP_PCT
)


ORACLE_X209 = f"""
WITH li AS (
    SELECT l_orderkey AS okey,
           CAST(round(l_extendedprice * (1 - l_discount) * 100)
                AS BIGINT) AS cents
    FROM lineitem
),
sums AS (SELECT okey, CAST(sum(cents) AS BIGINT) AS line_cents
         FROM li GROUP BY okey),
dev AS (
    SELECT (1000000 * abs(o.total_cents
                          - coalesce(s.line_cents, 0)))
               // o.total_cents AS dev_ppm
    FROM (SELECT o_orderkey AS okey,
                 CAST(round(o_totalprice * 100) AS BIGINT)
                     AS total_cents
          FROM orders) o
    LEFT JOIN sums s ON s.okey = o.okey
    WHERE o.total_cents > 0
),
binned AS (
    SELECT least(dev_ppm // 10000, {DEV_CAP_PCT}) AS dev_pct,
           dev_ppm
    FROM dev
),
tot AS (
    SELECT CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN dev_ppm = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_exact,
           CAST(sum(CASE WHEN dev_ppm <= 10000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_within_1pct,
           CAST(sum(CASE WHEN dev_ppm <= 100000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_within_10pct,
           max(dev_pct) AS max_dev_pct
    FROM binned
),
cells AS (SELECT dev_pct, CAST(count(*) AS BIGINT) AS c
          FROM binned GROUP BY dev_pct),
scored AS (
    SELECT dev_pct,
           CAST(sum(c) OVER (ORDER BY dev_pct
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
           CAST(sum(c) OVER () AS BIGINT) AS n
    FROM cells
),
qs AS (
    SELECT min(CASE WHEN cum >= (n * 50 + 99) // 100
                    THEN dev_pct END) AS p50_dev_pct,
           min(CASE WHEN cum >= (n * 90 + 99) // 100
                    THEN dev_pct END) AS p90_dev_pct
    FROM scored
)
SELECT t.n_orders, t.n_exact, t.n_within_1pct, t.n_within_10pct,
       q.p50_dev_pct, q.p90_dev_pct, t.max_dev_pct
FROM tot t CROSS JOIN qs q
"""


# ---------------------------------------------------------------- s31


def s31_stream_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming entropy trajectory
    (``streaming/entropy_monitor.py``): per-event-time-day exact
    micro-nat Shannon entropy of that day's integer-quantized value
    distribution — assembled from the SAME calendar-bounded
    (day, bucket) cells the s18/s26/s27 monitors maintain (one
    streaming kernel, four readouts; stream == batch proven in
    tests/test_r14_additions.py through the shared
    ``entropy_day_table`` assembly). Entropy reads CARDINALITY
    collapse (a day's mass landing on few buckets) that the Gini
    readout can under-report when the surviving buckets are small —
    the two are separated on planted cells in the queue tests."""
    from m5_competition_kaggle_spark.streaming.entropy_monitor import (
        entropy_day_table,
    )
    from m5_competition_kaggle_spark.streaming.ks_monitor import (
        day_bucket_counts,
    )

    ev = load_table(spark, sf_dir, "events")
    return entropy_day_table(day_bucket_counts(ev)).orderBy("day")


ORACLE_S31 = """
WITH cells AS (
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(round(value) AS BIGINT) AS q,
           CAST(count(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
),
per_day AS (
    SELECT day, CAST(sum(c) AS BIGINT) AS n_members,
           CAST(count(*) AS BIGINT) AS n_cells
    FROM cells GROUP BY day
),
terms AS (
    SELECT c.day, p.n_members, p.n_cells,
           c.c * (CAST(round(ln(p.n_members) * 1000000) AS BIGINT)
                  - CAST(round(ln(c.c) * 1000000) AS BIGINT))
               AS term
    FROM cells c JOIN per_day p ON p.day = c.day
)
SELECT day, n_members, n_cells,
       CAST(sum(term) AS BIGINT) AS h_num,
       CAST(sum(term) AS BIGINT) // n_members AS h_unat
FROM terms GROUP BY day, n_members, n_cells
ORDER BY day
"""


# --------------------------------------------------------------- x216

# round(10⁶·log10(1 + 1/d)), d = 1..9 — Benford's law expected
# first-digit shares in ppm. Integer literals shared by both engines;
# they sum to exactly 1,000,000.
_BENFORD_PPM = (
    301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757,
)


def x216_benford_digits(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Benford first-significant-digit audit of event values per
    type — the classic fabricated-data / unit-mixing instrument: a
    measured process spanning decades follows log10(1+1/d); a
    capped, uniform, or hand-entered column does not. Values are
    quantized to integer cents FIRST (round(value·100) — the x209
    convention; doubles never drive the digit), the first digit is
    the leading character of the integer's decimal string (identical
    cross-engine for integers — no float log10 anywhere), and every
    (type, digit) cell is zero-filled over the full 9-digit spine so
    the output is exactly |types|·9 rows with an exact
    total-variation distance tvd_ppm = Σ|share − benford| / 2 riding
    on each row (the one-number go/no-go).

    The fixture's values are bounded draws, so the corpus honestly
    reads FAR from Benford (large tvd_ppm) — the instrument's
    correct reading on synthetic data, pinned in the queue tests
    alongside a planted log-uniform corpus that reads close.

    Scale shape: one map-side-combining (type, digit) count — ≤
    |types|·9 cells at any corpus size — then cell-local arithmetic;
    flat in every growth dimension.

    Reference parity: engine extension (SURVEY §2 data-quality audit
    family beside x209 fact consistency / x203 bucket balance).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("q"),
    ).filter(F.col("q") >= 1)
    counts = (
        ev.select(
            "event_type",
            F.expr(
                "CAST(substring(CAST(q AS STRING), 1, 1)"
                " AS BIGINT)"
            ).alias("digit"),
        )
        .groupBy("event_type", "digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n_d"))
    )
    spine = (
        counts.select("event_type")
        .distinct()
        .crossJoin(
            F.broadcast(
                spark.range(1, 10).select(
                    F.col("id").cast("long").alias("digit")
                )
            )
        )
    )
    benford = "array({})".format(
        ", ".join(f"{p}L" for p in _BENFORD_PPM)
    )
    grid = (
        spine.join(counts, ["event_type", "digit"], "left")
        .select(
            "event_type",
            "digit",
            F.coalesce("n_d", F.lit(0).cast("long")).alias("n_d"),
            F.expr(
                f"element_at({benford}, CAST(digit AS INT))"
            ).alias("benford_ppm"),
        )
    )
    totals = grid.groupBy("event_type").agg(
        F.sum("n_d").alias("n_total")
    )
    shared = grid.join(totals, "event_type").select(
        "event_type",
        "digit",
        "n_d",
        "n_total",
        F.expr("(1000000 * n_d) DIV n_total").alias("share_ppm"),
        "benford_ppm",
    )
    tvd = shared.groupBy("event_type").agg(
        F.expr(
            "sum(abs(share_ppm - benford_ppm)) DIV 2"
        ).alias("tvd_ppm")
    )
    return (
        shared.join(F.broadcast(tvd), "event_type")
        .select(
            "event_type",
            "digit",
            "n_d",
            "n_total",
            "share_ppm",
            "benford_ppm",
            (F.col("share_ppm") - F.col("benford_ppm")).alias(
                "dev_ppm"
            ),
            "tvd_ppm",
        )
        .orderBy("event_type", "digit")
    )


ORACLE_X216 = f"""
WITH q AS (
    SELECT event_type,
           CAST(round(value * 100) AS BIGINT) AS q
    FROM events
),
counts AS (
    SELECT event_type,
           CAST(substr(CAST(q AS VARCHAR), 1, 1) AS BIGINT)
               AS digit,
           CAST(count(*) AS BIGINT) AS n_d
    FROM q WHERE q >= 1 GROUP BY 1, 2
),
spine AS (
    SELECT DISTINCT event_type, d.digit
    FROM counts
    CROSS JOIN (SELECT CAST(unnest(generate_series(1, 9)) AS BIGINT)
                AS digit) d
),
grid AS (
    SELECT s.event_type, s.digit,
           COALESCE(c.n_d, 0) AS n_d,
           ([{", ".join(str(p) for p in _BENFORD_PPM)}])[
               CAST(s.digit AS BIGINT)] AS benford_ppm
    FROM spine s LEFT JOIN counts c
        ON c.event_type = s.event_type AND c.digit = s.digit
),
shared AS (
    SELECT g.event_type, g.digit, g.n_d, t.n_total,
           (1000000 * g.n_d) // t.n_total AS share_ppm,
           g.benford_ppm
    FROM grid g
    JOIN (SELECT event_type, CAST(sum(n_d) AS BIGINT) AS n_total
          FROM grid GROUP BY event_type) t
        ON t.event_type = g.event_type
),
tvd AS (
    SELECT event_type,
           CAST(sum(abs(share_ppm - benford_ppm)) // 2 AS BIGINT)
               AS tvd_ppm
    FROM shared GROUP BY event_type
)
SELECT s.event_type, s.digit, s.n_d, s.n_total, s.share_ppm,
       s.benford_ppm, s.share_ppm - s.benford_ppm AS dev_ppm,
       t.tvd_ppm
FROM shared s JOIN tvd t ON t.event_type = s.event_type
ORDER BY s.event_type, s.digit
"""


QUERIES = {
    "x191_zipf_slope": x191_zipf_slope,
    "x192_implication_matrix": x192_implication_matrix,
    "x193_user_growth": x193_user_growth,
    "x194_langid_confusion": x194_langid_confusion,
    "x202_readability_forcast": x202_readability_forcast,
    "x209_fact_consistency": x209_fact_consistency,
    "s31_stream_entropy": s31_stream_entropy,
    "x216_benford_digits": x216_benford_digits,
}

ORACLES = {
    "x191_zipf_slope": ORACLE_X191,
    "x192_implication_matrix": ORACLE_X192,
    "x193_user_growth": ORACLE_X193,
    "x194_langid_confusion": _langid_confusion_oracle(),
    "x202_readability_forcast": ORACLE_X202,
    "x209_fact_consistency": ORACLE_X209,
    "s31_stream_entropy": ORACLE_S31,
    "x216_benford_digits": ORACLE_X216,
}
