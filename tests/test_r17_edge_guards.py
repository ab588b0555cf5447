"""Degenerate-input guards for the r17 staged operators: empty or
sub-minimal inputs must yield well-formed empty/NULL results, never
throw."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def test_phrase_adjacency_on_short_docs(spark):
    """Docs with < 2 tokens produce no bigrams (the size guard), and
    an all-short corpus yields an empty phrase table, not an error."""
    docs = spark.createDataFrame(
        [(1, "one"), (2, ""), (3, "  ")], "doc_id long, text string"
    ).select(
        "doc_id",
        F.expr(
            "filter(split(lower(text), '[^a-z0-9]+'),"
            " x -> x <> '')"
        ).alias("ws"),
    ).filter(F.size("ws") >= 2)
    bigrams = docs.select(
        F.explode(
            F.arrays_zip(
                F.expr("slice(ws, 1, size(ws) - 1)").alias("w1"),
                F.expr("slice(ws, 2, size(ws) - 1)").alias("w2"),
            )
        )
    )
    assert bigrams.count() == 0


def test_followed_by_no_errors_side(spark):
    """With zero B-side events every purchase is unfollowed — rates
    0, no join error."""
    p = spark.createDataFrame(
        [(1, 10, 1000)], "user_id long, pid long, pt long"
    )
    e = spark.createDataFrame([], "e_user long, et long")
    per_p = (
        p.join(
            e,
            (F.col("user_id") == F.col("e_user"))
            & (F.col("et") > F.col("pt"))
            & (F.col("et") <= F.col("pt") + F.lit(100)),
            "left",
        )
        .groupBy("pid")
        .agg(
            F.max(F.col("et").isNotNull().cast("long")).alias("f")
        )
        .collect()
    )
    assert [(r["pid"], r["f"]) for r in per_p] == [(10, 0)]


def test_path_signature_single_event_session(spark):
    """A one-event session's signature is just that event type — the
    transform/array_sort path must not need a second element."""
    firsts = spark.createDataFrame(
        [(1, 1, "view", 100)],
        "user_id long, session_id long, event_type string, t0 long",
    )
    sig = (
        firsts.groupBy("user_id", "session_id")
        .agg(
            F.concat_ws(
                ">",
                F.expr(
                    "transform(array_sort(collect_list("
                    "struct(t0, event_type))), x -> x.event_type)"
                ),
            ).alias("signature")
        )
        .collect()
    )
    assert sig[0]["signature"] == "view"


def test_quantile_cells_single_value(spark):
    """One distinct lag value: all three quantiles collapse to it."""
    cells = spark.createDataFrame(
        [(7, 5)], "lag_min long, c long"
    )
    w_cum = Window.orderBy("lag_min").rowsBetween(
        Window.unboundedPreceding, 0
    )
    scored = cells.withColumn(
        "cum", F.sum("c").over(w_cum)
    ).withColumn("n", F.sum("c").over(Window.partitionBy()))
    row = scored.agg(
        F.min(
            F.when(
                F.col("cum") >= F.expr("(n * 10 + 99) DIV 100"),
                F.col("lag_min"),
            )
        ).alias("p10"),
        F.min(
            F.when(
                F.col("cum") >= F.expr("(n * 90 + 99) DIV 100"),
                F.col("lag_min"),
            )
        ).alias("p90"),
    ).collect()[0]
    assert row["p10"] == 7 and row["p90"] == 7


def test_funnel_empty_corpus_matches_oracle(spark):
    """ADVICE r13: on an EMPTY events table the Spark side used to
    fabricate retained_ppm=10^6 for step 0 while the oracle's
    prev_n > 0 guard yielded NULL — both engines must now emit four
    rows of (0, NULL)."""
    import os
    import tempfile

    import duckdb

    from m5_competition_kaggle_spark.queries import extensions_r17

    d = tempfile.mkdtemp(prefix="x208_empty_")
    path = os.path.join(d, "events.parquet")
    spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(path)

    got = extensions_r17.x208_funnel_steps(spark, d).collect()
    assert [(r["step_idx"], r["n_reached"], r["retained_ppm"])
            for r in got] == [(i, 0, None) for i in range(4)]

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS"
        f" SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    oracle = con.execute(extensions_r17.ORACLE_X208).fetchall()
    assert [(r[0], r[2], r[3]) for r in oracle] == [
        (i, 0, None) for i in range(4)
    ]
