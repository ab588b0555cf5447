"""Online ANN probe (streaming/ann.py): the foreachBatch live path
must reproduce the batch twin exactly, across multiple micro-batches,
because it replays the identical plan per batch."""

import shutil
import tempfile

from pyspark.sql import functions as F

from m5_competition_kaggle_spark.sources.catalog import load_table
from m5_competition_kaggle_spark.streaming.ann import (
    ann_top1,
    streaming_ann_top1,
)

SF = "/root/testdata/sf0.001"


def test_stream_equals_batch_top1(spark):
    emb = load_table(spark, SF, "embeddings").persist()
    queries = emb.filter(F.col("vec_id") < 30)
    expected = sorted(
        map(tuple, ann_top1(queries, emb, m=16, n_codes=64).collect()))
    assert len(expected) == 30

    d = tempfile.mkdtemp(prefix="ann_stream_")
    got = []
    try:
        # two files -> at least the work spreads over multiple batches
        queries.filter(F.col("vec_id") < 15).coalesce(1) \
            .write.mode("overwrite").parquet(d + "/a")
        queries.filter(F.col("vec_id") >= 15).coalesce(1) \
            .write.mode("overwrite").parquet(d + "/b")
        import glob as _g
        import os as _os
        src = tempfile.mkdtemp(prefix="ann_stream_src_")
        for i, f in enumerate(sorted(
                _g.glob(d + "/*/*.parquet"))):
            shutil.copy(f, _os.path.join(src, f"part-{i}.parquet"))

        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = streaming_ann_top1(
            stream, emb,
            sink=lambda df, bid: got.extend(map(tuple, df.collect())),
            m=16, n_codes=64,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        shutil.rmtree(src, ignore_errors=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    assert sorted(got) == expected


def test_batch_top1_agrees_with_windowed_rank1(spark):
    """The min(struct) cut must equal pq_topk's rank-1 row for every
    query — the aggregate and the window are the same order."""
    from m5_competition_kaggle_spark.operators.similarity_pq import (
        pq_topk,
    )

    emb = load_table(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") < 25)
    via_agg = sorted(map(
        tuple, ann_top1(q, emb, m=16, n_codes=64).collect()))
    via_window = sorted(map(tuple, (
        pq_topk(emb, q, k=1, m=16, n_codes=64)
        .select("query_id", "vec_id", "est_dist")
        .collect())))
    assert via_agg == via_window


def test_checkpointed_restart_does_not_replay(spark):
    """The r5-advice checkpoint parameter end-to-end: with
    checkpoint_dir set, a restart over the SAME source resumes from
    committed offsets — the sink sees every query batch exactly once
    across both runs (no from-scratch reprocessing)."""
    emb = load_table(spark, SF, "embeddings").persist()
    queries = emb.filter(F.col("vec_id") < 20)
    expected = sorted(
        map(tuple, ann_top1(queries, emb, m=16, n_codes=64).collect()))

    src = tempfile.mkdtemp(prefix="ann_ckpt_src_")
    ckpt = tempfile.mkdtemp(prefix="ann_ckpt_")
    got = []

    def run_round():
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = streaming_ann_top1(
            stream, emb,
            sink=lambda df, bid: got.extend(map(tuple, df.collect())),
            checkpoint_dir=ckpt,
            m=16, n_codes=64,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    try:
        stage = tempfile.mkdtemp(prefix="ann_ckpt_stage_")
        queries.filter(F.col("vec_id") < 10).coalesce(1) \
            .write.mode("overwrite").parquet(stage + "/a")
        import glob as _g
        import os as _os
        for i, f in enumerate(sorted(_g.glob(stage + "/a/*.parquet"))):
            shutil.copy(f, _os.path.join(src, f"part-a{i}.parquet"))
        run_round()
        n_first = len(got)
        assert 0 < n_first < len(expected)

        # restart over the same source + one NEW file: only the new
        # file's queries flow to the sink
        queries.filter(F.col("vec_id") >= 10).coalesce(1) \
            .write.mode("overwrite").parquet(stage + "/b")
        for i, f in enumerate(sorted(_g.glob(stage + "/b/*.parquet"))):
            shutil.copy(f, _os.path.join(src, f"part-b{i}.parquet"))
        run_round()
        shutil.rmtree(stage, ignore_errors=True)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)

    assert sorted(got) == expected  # each query answered exactly once
