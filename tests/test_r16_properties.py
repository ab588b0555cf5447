"""Property tests for the staged r16 operators against brute-force
pure-Python references — the randomized hardening layer under the
oracle differential (which fixes ONE dataset; these sweep many).

The headline property: the stateful transition kernel must be
SPLIT-INVARIANT — pairing a timeline through ANY sequence of
micro-batch boundaries (state carried between them) yields exactly the
whole-timeline pairs. That is the property the streaming deployment
stakes its correctness on, checked here over many random timelines and
random split points without spinning up a stream."""

from __future__ import annotations

import math
import random

import pandas as pd
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.streaming.transition_state import (
    NANOS_PER_DAY,
    _pairs_from_frame,
)


def _whole_timeline_pairs(events):
    """Brute force: sort, zip consecutive."""
    seq = sorted(events)
    out = []
    for (t0, _, s0), (t1, _, s1) in zip(seq, seq[1:]):
        out.append((t1 // NANOS_PER_DAY, s0, s1))
    return out


def test_transition_kernel_split_invariance(spark):
    rng = random.Random(1616)
    for trial in range(25):
        n = rng.randrange(1, 30)
        events = [
            (
                rng.randrange(0, 5 * NANOS_PER_DAY),
                i,  # unique event_id tie-break
                rng.choice("ABCD"),
            )
            for i in range(n)
        ]
        expected = _whole_timeline_pairs(events)

        # random batch boundaries over the TIME-ordered stream (the
        # ordering contract: batches arrive in event-time order)
        seq = sorted(events)
        k = rng.randrange(1, 6)
        cuts = sorted(rng.sample(range(0, n), min(k, n)))
        batches, prev = [], 0
        for c in cuts + [n]:
            if c > prev:
                batches.append(seq[prev:c])
                prev = c
        got, state = [], None
        for b in batches:
            pdf = pd.DataFrame(
                {
                    "tsn": [t for t, _, _ in b],
                    "event_id": [e for _, e, _ in b],
                    "event_type": [s for _, _, s in b],
                }
            )
            pairs, _, state = _pairs_from_frame(pdf, state)
            got += list(zip(pairs["day"], pairs["a"], pairs["b"]))
        assert got == expected, (trial, len(batches))


def test_runs_and_moments_brute_force(spark):
    """The x181 window arithmetic equals the obvious O(n) Python scan
    over random series, including the exact null moments."""
    from pyspark.sql.window import Window

    rng = random.Random(8181)
    for trial in range(8):
        ys = [rng.randrange(0, 6) for _ in range(rng.randrange(3, 40))]
        # brute force
        moves = [
            1 if b > a else -1
            for a, b in zip(ys, ys[1:])
            if b != a
        ]
        if not moves:
            continue
        np_ = sum(1 for m in moves if m == 1)
        nm = len(moves) - np_
        runs = 1 + sum(
            1 for a, b in zip(moves, moves[1:]) if a != b
        )
        df = spark.createDataFrame(
            [("k", t, y) for t, y in enumerate(ys)],
            "event_type string, t long, y long",
        )
        w = Window.partitionBy("event_type").orderBy("t")
        mv = (
            df.withColumn("diff", F.col("y") - F.lag("y").over(w))
            .filter(
                F.col("diff").isNotNull() & (F.col("diff") != 0)
            )
            .select(
                "event_type", "t",
                F.when(F.col("diff") > 0, F.lit(1))
                .otherwise(F.lit(-1)).alias("mv"),
            )
        )
        got = (
            mv.withColumn(
                "new_run",
                F.when(
                    F.lag("mv").over(w).isNull()
                    | (F.lag("mv").over(w) != F.col("mv")),
                    F.lit(1),
                ).otherwise(F.lit(0)),
            )
            .groupBy("event_type")
            .agg(
                F.sum(F.when(F.col("mv") == 1, 1).otherwise(0))
                .alias("np"),
                F.sum(F.when(F.col("mv") == -1, 1).otherwise(0))
                .alias("nm"),
                F.sum("new_run").alias("runs"),
            )
            .collect()[0]
        )
        assert (got["np"], got["nm"], got["runs"]) == (
            np_, nm, runs,
        ), (trial, ys)


def test_entropy_brute_force(spark):
    """x180's per-state h_num equals the naive Python sum of
    c_ab * (L(c_a) - L(c_ab)) over random transition multisets."""
    from m5_competition_kaggle_spark.operators.markov import (
        transition_pairs,
    )

    rng = random.Random(1800)
    for trial in range(6):
        rows = []
        t = 0
        for u in range(rng.randrange(2, 8)):
            for _ in range(rng.randrange(1, 12)):
                rows.append((f"u{u}", t, rng.choice("PQR")))
                t += 1
        df = spark.createDataFrame(
            rows, "k string, t long, s string"
        )
        pairs = transition_pairs(df, "k", "s", ("t",))
        got = {
            r["a"]: r["h_num"]
            for r in pairs.groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("c_ab"))
            .withColumn(
                "c_a",
                F.sum("c_ab").over(
                    __import__(
                        "pyspark.sql.window", fromlist=["Window"]
                    ).Window.partitionBy("a")
                ),
            )
            .select(
                "a",
                (
                    F.col("c_ab")
                    * F.expr(
                        "CAST(round(ln(c_a) * 1000000) AS BIGINT)"
                        " - CAST(round(ln(c_ab) * 1000000)"
                        "   AS BIGINT)"
                    )
                ).alias("term"),
            )
            .groupBy("a")
            .agg(F.sum("term").alias("h_num"))
            .collect()
        }
        # brute force over the same pairs
        plist = [
            (r["a"], r["b"]) for r in pairs.collect()
        ]
        if not plist:
            continue
        c_ab: dict = {}
        for a, b in plist:
            c_ab[(a, b)] = c_ab.get((a, b), 0) + 1
        c_a: dict = {}
        for (a, _), c in c_ab.items():
            c_a[a] = c_a.get(a, 0) + c
        expected: dict = {}
        for (a, b), c in c_ab.items():
            term = c * (
                round(math.log(c_a[a]) * 1e6)
                - round(math.log(c) * 1e6)
            )
            expected[a] = expected.get(a, 0) + term
        assert got == expected, trial
