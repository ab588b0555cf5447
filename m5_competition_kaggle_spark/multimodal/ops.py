"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Design for image/audio/video at 100 TB: the asset is an opaque binary
column (or a pointer to object storage) plus a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so bytes never leave the executor and batches
amortize the Python hop.

The decode libraries (PIL/ffmpeg/torchvision) are NOT in this container,
so the codec step is stubbed: ``decode="fake"`` computes deterministic
metadata from the byte stream (real Spark plumbing — schema, batching,
partitioning — with a fake codec); ``decode="real"`` raises
NotImplementedError where the library call would go.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Deterministic fake-codec formulas (shared with the SQL oracle):
#   width  = 64 + n_bytes % 577
#   height = 64 + (n_bytes * 31) % 577
#   n_frames = 1 + n_bytes % 24
ASSET_META_SCHEMA = (
    "doc_id long, n_bytes long, width long, height long, n_frames long"
)


def to_binary_assets(df: DataFrame, key_col: str, text_col: str) -> DataFrame:
    """Wrap a source column as an opaque binary payload column — the ingest
    shape a real image/audio pipeline would have."""
    return df.select(
        F.col(key_col), F.encode(F.col(text_col), "UTF-8").alias("content")
    )


def decode_assets(
    assets: DataFrame, key_col: str = "doc_id", mode: str = "fake"
) -> DataFrame:
    """Decode stage over binary payloads via Arrow-batched ``mapInPandas``.

    ``mode="fake"``: deterministic metadata from byte length (see module
    docstring). ``mode="real"``: the spot where PIL/ffmpeg decode goes —
    raises NotImplementedError in this container.
    """
    if mode not in ("fake", "real"):
        raise ValueError(f"unknown decode mode {mode!r}")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if mode == "real":
                raise NotImplementedError(
                    "real image/audio decode requires PIL/ffmpeg (not in "
                    "this container); use mode='fake' for plumbing tests"
                )
            n_bytes = pdf["content"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[key_col],
                    "n_bytes": n_bytes,
                    "width": 64 + n_bytes % 577,
                    "height": 64 + (n_bytes * 31) % 577,
                    "n_frames": 1 + n_bytes % 24,
                }
            )

    # Guide §4: explicit prune — the kernel reads only (key, content).
    return assets.select(key_col, "content").mapInPandas(
        decode, ASSET_META_SCHEMA)


def sample_frames(
    meta: DataFrame, every_n: int = 8
) -> DataFrame:
    """Frame-sampling plan stage: one output row per sampled frame index.
    Pure column op (sequence + explode) — the expensive per-frame decode
    would chain another ``mapInPandas`` after this fan-out."""
    return meta.withColumn(
        "frame_idx",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))),
    )
