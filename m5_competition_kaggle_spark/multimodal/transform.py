"""Multimodal transform stages: resize + feature-extract.

Completes the plumbing quartet promised in ``multimodal/ops.py``
(decode / feature-extract / resize / frame-sample): both run as
Arrow-batched ``mapInPandas`` stages over the opaque ``binary``
payload column, the 100 TB shape where bytes never leave the executor
and batches amortize the Python hop. Kept in a NEW module (not
ops.py) because ops.py sits in certified query closures — the
certification-ledger contract for new capability.

Same codec policy as ops.py: the real decoder libraries
(PIL/torchvision/ffmpeg) are not in this container, so
``mode="fake"`` runs a DETERMINISTIC byte-level stand-in over real
Spark plumbing (schema, Arrow batching, partitioning — all real and
tested), and ``mode="real"`` raises NotImplementedError exactly where
the library call would go.

The fake feature extractor is not arbitrary: a normalized 16-bin byte
histogram is a genuine (if weak) content signature, so the output
``array<float>`` column is semantically an embedding — tests compose
it into the certified ANN kernels (``operators/similarity.py``) to
prove the binary → embedding → top-k path end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

FEATURE_DIM = 16

RESIZED_SCHEMA = (
    "doc_id long, width long, height long, content binary"
)
FEATURES_SCHEMA = "doc_id long, feature array<float>"


def resize_assets(
    assets: DataFrame,
    target_w: int = 64,
    target_h: int = 64,
    key_col: str = "doc_id",
    mode: str = "fake",
) -> DataFrame:
    """Resize stage over binary payloads via ``mapInPandas``.

    ``mode="fake"``: deterministic byte decimation — keeps every
    k-th byte where k scales the payload toward ``target_w*target_h``
    (monotone: larger targets keep more bytes), emitting the target
    dimensions plus the decimated payload. ``mode="real"``: the
    PIL/torchvision resize site — raises in this container.
    """
    if mode not in ("fake", "real"):
        raise ValueError(f"unknown resize mode {mode!r}")
    target = max(1, int(target_w) * int(target_h))

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if mode == "real":
                raise NotImplementedError(
                    "real image resize requires PIL/torchvision (not"
                    " in this container); use mode='fake' for"
                    " plumbing tests"
                )

            def _decimate(b: bytes) -> bytes:
                k = max(1, len(b) // target)
                return b[::k]

            yield pd.DataFrame(
                {
                    "doc_id": pdf[key_col],
                    "width": target_w,
                    "height": target_h,
                    "content": pdf["content"].map(_decimate),
                }
            )

    # Guide §4: mapInPandas is opaque to column pruning — ship only
    # the two columns the kernel reads, so a wider caller frame never
    # drags extra columns through the Arrow boundary (or the scan).
    return assets.select(key_col, "content").mapInPandas(
        resize, RESIZED_SCHEMA)


def extract_features(
    assets: DataFrame,
    key_col: str = "doc_id",
    mode: str = "fake",
) -> DataFrame:
    """Feature-extract stage: binary payload → ``array<float>``
    embedding column via ``mapInPandas``.

    ``mode="fake"``: the normalized 16-bin byte histogram (bin =
    byte // 16), an order-insensitive content signature — identical
    payloads get identical features, and the output column is a real
    embedding the certified ANN kernels consume downstream.
    ``mode="real"``: the CLIP/torchvision encoder site — raises in
    this container.
    """
    if mode not in ("fake", "real"):
        raise ValueError(f"unknown feature mode {mode!r}")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if mode == "real":
                raise NotImplementedError(
                    "real feature extraction requires a vision"
                    " encoder (not in this container); use"
                    " mode='fake' for plumbing tests"
                )

            def _hist(b: bytes) -> list[float]:
                counts = [0] * FEATURE_DIM
                for byte in b:
                    counts[byte >> 4] += 1
                n = max(1, len(b))
                return [c / n for c in counts]

            yield pd.DataFrame(
                {
                    "doc_id": pdf[key_col],
                    "feature": pdf["content"].map(_hist),
                }
            )

    # Guide §4: explicit prune — the kernel reads only (key, content).
    return assets.select(key_col, "content").mapInPandas(
        extract, FEATURES_SCHEMA)
