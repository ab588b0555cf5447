"""Audio segmentation plumbing (multimodal/audio.py)."""

import pytest
from pyspark.sql import functions as F

from m5_competition_kaggle_spark.multimodal.audio import (
    audio_meta,
    segment_audio,
)
from m5_competition_kaggle_spark.multimodal.ops import to_binary_assets
from m5_competition_kaggle_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _meta(spark):
    docs = load_table(spark, SF, "documents")
    return audio_meta(to_binary_assets(docs, "doc_id", "text"))


def test_segments_tile_the_clip(spark):
    rows = segment_audio(_meta(spark), 1000, 600).collect()
    assert rows
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc, segs in by_doc.items():
        segs.sort(key=lambda r: r["seg_idx"])
        dur = segs[0]["duration_ms"]
        # contiguous indices from 0; starts every hop; ends clipped
        for i, s in enumerate(segs):
            assert s["seg_idx"] == i
            assert s["start_ms"] == i * 600
            assert s["start_ms"] < dur
            assert s["end_ms"] == min(s["start_ms"] + 1000, dur)
        # full coverage: the last segment reaches the clip end
        assert segs[-1]["end_ms"] == dur
        # overlap: consecutive segments share seg_ms - hop_ms = 400 ms
        if len(segs) > 1:
            assert segs[0]["end_ms"] > segs[1]["start_ms"]


def test_real_mode_raises(spark):
    meta = audio_meta(
        to_binary_assets(load_table(spark, SF, "documents"),
                         "doc_id", "text"),
        mode="real",
    )
    with pytest.raises(Exception, match="NotImplementedError|ffmpeg"):
        meta.limit(1).collect()


def test_zero_duration_clips_have_no_segments(spark):
    empty = to_binary_assets(
        load_table(spark, SF, "documents").filter(F.lit(False)),
        "doc_id", "text",
    )
    assert segment_audio(audio_meta(empty)).count() == 0
