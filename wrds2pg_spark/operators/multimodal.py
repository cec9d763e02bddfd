"""Multimodal column handling: opaque ``binary`` payloads (image /
audio / video bytes) with typed metadata, processed by Arrow-batched
``mapInPandas`` pipelines.

The container has no image/audio codecs, so the actual decode is a
STUB: ``decode_image_stub`` derives deterministic fake features from
the bytes (documented as such).  Everything around it — schema
handling, binary columns, batch iteration, partition-friendly UDF
shape — is real and is exactly what a production decoder would plug
into: replace the body of ``_fake_decode`` with PIL/ffmpeg calls and
nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["binary_stats", "decode_image_stub", "IMAGE_FEATURE_SCHEMA"]


def binary_stats(df: DataFrame, bin_col: str, id_col: str) -> DataFrame:
    """Byte-level metadata over a binary column — all JVM built-ins
    (works identically on real image bytes)."""
    b = F.col(bin_col)
    return df.select(
        F.col(id_col),
        F.octet_length(b).cast("long").alias("n_bytes"),
        F.md5(b).alias("content_md5"),
        F.sha2(b, 256).alias("content_sha256"),
    )


IMAGE_FEATURE_SCHEMA = (
    "id long, n_bytes long, width int, height int, mode string, "
    "mean_luma double"
)


def _fake_decode(payload: bytes) -> tuple[int, int, str, float]:
    """STUB for the real image decoder (no codec libs in this
    container).  Deterministic fake: dimensions and luminance are
    derived from a sha256 of the bytes, so tests are reproducible.
    A real implementation returns PIL.Image size/mode/statistics."""
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    mode = ["RGB", "RGBA", "L"][digest[2] % 3]
    mean_luma = round(digest[3] / 255.0, 6)
    return width, height, mode, mean_luma


def decode_image_stub(
    df: DataFrame, bin_col: str, id_col: str
) -> DataFrame:
    """Arrow-batched decode pipeline: binary column in, typed feature
    columns out.  ``mapInPandas`` keeps whole Arrow batches in flight
    (one Python round-trip per batch, not per row) and preserves the
    input partitioning — no shuffle."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(p) for p in pdf[bin_col]]
            yield pd.DataFrame({
                "id": pdf[id_col].astype("int64"),
                "n_bytes": pdf[bin_col].map(len).astype("int64"),
                "width": [f[0] for f in feats],
                "height": [f[1] for f in feats],
                "mode": [f[2] for f in feats],
                "mean_luma": [f[3] for f in feats],
            })

    return df.select(id_col, bin_col).mapInPandas(
        decode_batches, schema=IMAGE_FEATURE_SCHEMA
    )
