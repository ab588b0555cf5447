"""Round-6-window operators: BM25 retrieval, prefix-filtered set-
similarity join, k-core peeling (semantic invariants beyond the x63/
x64/x65 oracle hashes)."""

import itertools
import random

import pytest
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.operators.graph_metrics import kcore_peel
from m5_competition_kaggle_spark.operators.retrieval import bm25_topk
from m5_competition_kaggle_spark.operators.setsim import (
    jaccard_prefix_join,
)

# ------------------------------------------------- prefix-filter join


def _brute_jaccard_pairs(texts, p, q):
    sets = {i: set(t.split()) for i, t in texts}
    out = set()
    for (ia, sa), (ib, sb) in itertools.combinations(sets.items(), 2):
        inter = len(sa & sb)
        union = len(sa | sb)
        if q * inter >= p * union:
            out.add((min(ia, ib), max(ia, ib), inter, union))
    return out


def _run_prefix_join(spark, texts, p, q):
    df = spark.createDataFrame(texts, "doc_id long, text string")
    rows = jaccard_prefix_join(df, "doc_id", "text",
                               threshold_p=p, threshold_q=q).collect()
    return {(r.id_a, r.id_b, r.inter_cnt, r.union_cnt) for r in rows}


def test_prefix_join_lossless_random_corpus(spark):
    """The prefix filter must return EXACTLY the brute-force pair set
    (AllPairs lossless-candidate lemma) on an adversarial mix of set
    sizes, including singletons and identical sets."""
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(40)]
    texts = []
    for i in range(80):
        n = rng.randint(1, 14)
        texts.append((i, " ".join(rng.sample(vocab, n))))
    texts += [(100, "w0 w1 w2 w3 w4"), (101, "w0 w1 w2 w3 w4"),  # identical
              (102, "w0"), (103, "w0")]                           # singleton
    for p, q in [(9, 10), (3, 5), (1, 2)]:
        assert _run_prefix_join(spark, texts, p, q) == \
            _brute_jaccard_pairs(texts, p, q), f"threshold {p}/{q}"


def test_prefix_join_shingle_mode_lossless(spark):
    """shingle_size=n must equal brute force over distinct n-shingle
    sets (short docs contribute their whole text as one shingle,
    matching doc_shingles)."""
    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(12)]
    texts = [(i, " ".join(rng.choice(vocab)
                          for _ in range(rng.randint(1, 10))))
             for i in range(60)]

    def shingle_set(t, n=2):
        toks = t.split()
        if len(toks) < n:
            return {" ".join(toks)}
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    p, q = 1, 2
    sets = {i: shingle_set(t) for i, t in texts}
    expect = set()
    for (ia, sa), (ib, sb) in itertools.combinations(sets.items(), 2):
        inter, union = len(sa & sb), len(sa | sb)
        if q * inter >= p * union:
            expect.add((min(ia, ib), max(ia, ib), inter, union))
    df = spark.createDataFrame(texts, "doc_id long, text string")
    rows = jaccard_prefix_join(df, "doc_id", "text", p, q,
                               shingle_size=2).collect()
    got = {(r.id_a, r.id_b, r.inter_cnt, r.union_cnt) for r in rows}
    assert got == expect


def test_prefix_join_duplicate_tokens_use_set_semantics(spark):
    """Repeated tokens in a doc count once (distinct-token Jaccard)."""
    texts = [(1, "a a a b"), (2, "a b b b")]
    got = _run_prefix_join(spark, texts, 1, 2)
    assert got == {(1, 2, 2, 2)}  # both are {a, b}: J = 1


def test_prefix_join_empty_and_single_doc(spark):
    assert _run_prefix_join(spark, [(1, "only doc here")], 9, 10) == set()
    df = spark.createDataFrame([], "doc_id long, text string")
    assert jaccard_prefix_join(df, "doc_id", "text").count() == 0


# ------------------------------------------------------------- k-core


def _true_kcore(edges, k):
    """Fixpoint k-core by repeated peeling, driver-side."""
    es = {tuple(sorted(e)) for e in edges}
    while True:
        deg = {}
        for u, v in es:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        drop = {n for n, d in deg.items() if d < k}
        if not drop:
            return deg
        es = {(u, v) for u, v in es if u not in drop and v not in drop}


def _run_kcore(spark, edges, k, rounds):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {r.node: r.deg
            for r in kcore_peel(df, k=k, rounds=rounds).collect()}


def test_kcore_matches_fixpoint_when_converged(spark):
    """Triangle + pendant chain: chain peels in <= 3 rounds, so the
    4-round peel equals the true 2-core (the triangle, degree 2)."""
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6)]
    assert _run_kcore(spark, edges, k=2, rounds=4) == {1: 2, 2: 2, 3: 2}
    assert _true_kcore(edges, 2) == {1: 2, 2: 2, 3: 2}


def test_kcore_random_graph_fixpoint(spark):
    """Sparse random graph: rounds chosen >= peel depth, result must
    equal the driver-side fixpoint exactly (nodes AND degrees)."""
    rng = random.Random(11)
    edges = list({tuple(sorted(rng.sample(range(30), 2)))
                  for _ in range(45)})
    expect = _true_kcore(edges, 2)
    got = _run_kcore(spark, edges, k=2, rounds=8)
    assert got == expect


def test_kcore_rounds_monotone(spark):
    """More rounds only ever shrink (or keep) the survivor set."""
    rng = random.Random(3)
    edges = list({tuple(sorted(rng.sample(range(20), 2)))
                  for _ in range(28)})
    prev = None
    for rounds in (1, 2, 4):
        cur = set(_run_kcore(spark, edges, k=3, rounds=rounds))
        if prev is not None:
            assert cur <= prev
        prev = cur


def test_kcore_clique_survives_whole(spark):
    edges = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    got = _run_kcore(spark, edges, k=4, rounds=3)
    assert got == {n: 4 for n in range(5)}


def test_kcore_empty_edges(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert kcore_peel(df, k=2, rounds=2).count() == 0


# --------------------------------------------------------------- BM25


@pytest.fixture(scope="module")
def bm25_result(spark):
    docs = [
        (1, "spark engine spark engine spark"),
        (2, "spark engine query plans"),
        (3, "query plans query plans engine"),
        (4, "plans plans plans plans plans"),
        (5, "other words entirely here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return bm25_topk(df, "doc_id", "text",
                     n_terms=3, min_token_len=4, k=3).collect()


def test_bm25_rank_shape(bm25_result):
    by_term = {}
    for r in bm25_result:
        by_term.setdefault(r.term, []).append(r)
    assert len(by_term) == 3
    for term, rows in by_term.items():
        ranks = sorted(r.rank for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        assert len(rows) <= 3
        ordered = sorted(rows, key=lambda r: r.rank)
        scores = [r.score for r in ordered]
        assert scores == sorted(scores, reverse=True)
        assert all(r.tf > 0 and r.score > 0 for r in rows)


def test_bm25_tf_saturation_beats_nothing(bm25_result):
    """doc 4 (tf=5 of 'plans', short doc) must outrank doc 3 (tf=2)
    for term 'plans' — tf monotonicity at equal dl is preserved."""
    plans = {r.doc_id: r.rank for r in bm25_result if r.term == "plans"}
    assert plans[4] < plans[3]


def test_bm25_term_selection_is_df_ordered(spark):
    """min_token_len filters short tokens; the query set is the top-df
    survivors — 'engine'/'plans'/'query'/'spark' all len>=4, top-3 by
    (df DESC, token ASC) is deterministic."""
    docs = [
        (1, "spark engine spark engine spark"),
        (2, "spark engine query plans"),
        (3, "query plans query plans engine"),
        (4, "plans plans plans plans plans"),
        (5, "other words entirely here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = bm25_topk(df, "doc_id", "text",
                    n_terms=2, min_token_len=4, k=10)
    terms = {r.term for r in out.select("term").distinct().collect()}
    # df: engine 3, plans 3, query 2, spark 2, ... -> top-2 = engine, plans
    assert terms == {"engine", "plans"}


def test_bm25_empty_docs(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    assert bm25_topk(df, "doc_id", "text").count() == 0


# ------------------------------------------- HLL overlap sketch (x69)


def test_hll_overlap_union_dominates_parts(spark):
    """Register-max union is monotone: raising any register can only
    raise the integer estimate, so est_union >= max(est_a, est_b) for
    EVERY pair, and the inclusion-exclusion intersection stays within
    [0, min(est_a, est_b)] + nothing (upper bound holds exactly when
    union >= max)."""
    import m5_competition_kaggle_spark.queries.extensions_r6 as r6

    rows = r6.QUERIES["x69_source_overlap_sketch"](
        spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r.est_union >= max(r.est_a, r.est_b), r
        assert 0 <= r.est_inter <= min(r.est_a, r.est_b), r


# ---------------------------------------------- CMS heavy hitters (x70)


def test_heavy_hitters_equal_exact_filter_and_never_undercount(spark):
    import m5_competition_kaggle_spark.queries.extensions_r6 as r6
    from m5_competition_kaggle_spark.functions.text import tokens
    from m5_competition_kaggle_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    rows = r6.QUERIES["x70_heavy_hitters"](spark, sf).collect()
    assert rows
    assert all(r.overcount >= 0 for r in rows)  # CMS never undercounts
    docs = load_table(spark, sf, "documents")
    exact = {
        r.t: r.c
        for r in docs.select(F.explode(tokens("text")).alias("t"))
        .filter(F.col("t") != "")
        .groupBy("t").agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= r6.HH_THRESHOLD)
        .collect()
    }
    assert {r.token: r.exact_cnt for r in rows} == exact


# ------------------------------------------------ PQ ANN rerank (x72)


def test_pq_rerank_recall_floor(spark):
    """Two-stage PQ (ADC shortlist -> exact rerank) must keep >= 90%
    of the true quantized-L2 top-10 on the sf0.001 embeddings — the
    production-recipe guarantee the ADC stage alone can't make on
    near-random vectors."""
    from pyspark.sql import Window

    from m5_competition_kaggle_spark.operators.similarity import (
        quantize_expr,
    )
    from m5_competition_kaggle_spark.operators.similarity_pq import (
        pq_topk_rerank,
    )
    from m5_competition_kaggle_spark.sources.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    got = pq_topk_rerank(emb, q, k=10, shortlist=100,
                         m=16, n_codes=64)
    qz = emb.select(F.col("vec_id").alias("vid"),
                    quantize_expr("embedding").alias("v"))
    a = qz.select(F.col("vid").alias("query_id"),
                  F.col("v").alias("qv")).filter(F.col("query_id") < 20)
    d = (
        a.crossJoin(qz)
        .filter(F.col("query_id") != F.col("vid"))
        .withColumn("dist", F.expr(
            "aggregate(zip_with(qv, v, (x,y)->(x-y)*(x-y)),"
            " 0L, (acc,v)->acc+v)"))
    )
    w = Window.partitionBy("query_id").orderBy("dist", "vid")
    exact = (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("query_id", F.col("vid").alias("vec_id"))
    )
    n_true = exact.count()
    hits = got.join(exact, ["query_id", "vec_id"], "leftsemi").count()
    assert n_true == 200
    assert hits / n_true >= 0.90, hits / n_true


def test_pq_rerank_distances_are_exact(spark):
    """Stage-2 distances must equal the true quantized L2 (the rerank
    is exact, only the candidate set is approximate)."""
    from m5_competition_kaggle_spark.operators.similarity_pq import (
        pq_topk_rerank,
    )
    from m5_competition_kaggle_spark.sources.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    rows = pq_topk_rerank(emb, q, k=3, shortlist=50,
                          m=16, n_codes=64).collect()
    vecs = {r.vec_id: r.embedding
            for r in emb.filter(F.col("vec_id") < 1000).collect()}

    def qdist(a, b):
        qa = [round(float(x) * 1000) for x in a]
        qb = [round(float(x) * 1000) for x in b]
        return sum((x - y) * (x - y) for x, y in zip(qa, qb))

    for r in rows:
        assert r.dist == qdist(vecs[r.query_id], vecs[r.vec_id]), r


def test_kcore_fixpoint_mode(spark):
    """rounds=None peels to the TRUE fixpoint regardless of depth: a
    long pendant chain (peel depth ~ chain length) hanging off a
    triangle must fully dissolve, leaving exactly the 2-core."""
    chain = [(i, i + 1) for i in range(3, 30)]
    edges = [(1, 2), (2, 3), (1, 3)] + chain
    got = _run_kcore(spark, edges, k=2, rounds=None)
    assert got == {1: 2, 2: 2, 3: 2}

    rng = random.Random(17)
    redges = list({tuple(sorted(rng.sample(range(40), 2)))
                   for _ in range(60)})
    assert _run_kcore(spark, redges, k=3, rounds=None) == \
        _true_kcore(redges, 3)


def test_source_jaccard_max_df_knob(spark):
    """max_df=None reproduces the exact matrix; a cap drops only the
    shingles above it (here: the shingle shared by ALL groups), and
    permille stays in range."""
    from m5_competition_kaggle_spark.operators.setsim import (
        source_jaccard_matrix,
    )

    rows = [
        (1, "g1", "common common common alpha beta gamma"),
        (2, "g2", "common common common delta epsilon zeta"),
        (3, "g3", "common common common eta theta iota"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    exact = {(r.source_a, r.source_b): r.inter_cnt
             for r in source_jaccard_matrix(
                 df, "source", "doc_id", "text", shingle_size=2).collect()}
    capped = {(r.source_a, r.source_b): (r.inter_cnt, r.jacc_permille)
              for r in source_jaccard_matrix(
                  df, "source", "doc_id", "text", shingle_size=2,
                  max_df=2).collect()}
    # 'common common' appears in all 3 groups -> dropped at max_df=2;
    # with it, every pair intersects; without it, none do.
    assert all(v >= 1 for v in exact.values())
    assert capped == {}  # no shared shingle survives the cap
