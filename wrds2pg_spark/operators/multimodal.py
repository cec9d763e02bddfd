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

__all__ = [
    "binary_stats", "decode_image_stub", "decode_audio_stub",
    "sample_frames_stub", "resize_stub",
    "IMAGE_FEATURE_SCHEMA", "AUDIO_FEATURE_SCHEMA",
]


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


AUDIO_FEATURE_SCHEMA = (
    "id long, n_bytes long, sample_rate int, n_channels int, "
    "duration_s double, rms double"
)


def _fake_audio_decode(payload: bytes) -> tuple[int, int, float, float]:
    """STUB for the real audio decoder (no codec libs here) — same
    contract as _fake_decode: deterministic pseudo-features from a
    sha256.  A real implementation returns soundfile/ffprobe stats."""
    d = hashlib.sha256(payload).digest()
    sample_rate = [8000, 16000, 22050, 44100, 48000][d[0] % 5]
    n_channels = 1 + d[1] % 2
    duration_s = round(0.5 + d[2] / 16.0, 6)
    rms = round(d[3] / 255.0, 6)
    return sample_rate, n_channels, duration_s, rms


def decode_audio_stub(df: DataFrame, bin_col: str, id_col: str) -> DataFrame:
    """Audio twin of decode_image_stub: binary in, typed features out,
    Arrow-batched, partition-preserving."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_audio_decode(p) for p in pdf[bin_col]]
            yield pd.DataFrame({
                "id": pdf[id_col].astype("int64"),
                "n_bytes": pdf[bin_col].map(len).astype("int64"),
                "sample_rate": [f[0] for f in feats],
                "n_channels": [f[1] for f in feats],
                "duration_s": [f[2] for f in feats],
                "rms": [f[3] for f in feats],
            })

    return df.select(id_col, bin_col).mapInPandas(
        decode_batches, schema=AUDIO_FEATURE_SCHEMA
    )


def sample_frames_stub(
    df: DataFrame, bin_col: str, id_col: str, fps: float = 1.0
) -> DataFrame:
    """Video frame sampling plumbing: one input row (video payload)
    expands to N output rows (frame payloads) inside ``mapInPandas`` —
    the row-expanding UDF shape a real ffmpeg frame sampler uses.
    The STUB derives a deterministic frame count from the fake
    duration and slices the payload bytes per frame."""

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, frames = [], [], [], []
            for vid, payload in zip(pdf[id_col], pdf[bin_col]):
                _, _, duration_s, _ = _fake_audio_decode(payload)
                n_frames = max(1, int(duration_s * fps))
                step = max(1, len(payload) // n_frames)
                for i in range(n_frames):
                    ids.append(int(vid))
                    idxs.append(i)
                    offs.append(round(i / fps, 6))
                    frames.append(payload[i * step:(i + 1) * step])
            yield pd.DataFrame({
                "id": ids, "frame_idx": idxs,
                "ts_offset_s": offs, "frame": frames,
            })

    return df.select(id_col, bin_col).mapInPandas(
        sample_batches,
        schema="id long, frame_idx int, ts_offset_s double, frame binary",
    )


def resize_stub(
    df: DataFrame, bin_col: str, id_col: str, max_bytes: int = 4096
) -> DataFrame:
    """Binary -> binary transform plumbing (image resize shape): the
    STUB truncates the payload to ``max_bytes``; a real implementation
    decodes, resizes, re-encodes.  Stays a narrow map — the column
    shape and partitioning are what matter at scale."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "id": pdf[id_col].astype("int64"),
                "payload": pdf[bin_col].map(lambda b: bytes(b[:max_bytes])),
            })

    return df.select(id_col, bin_col).mapInPandas(
        resize_batches, schema="id long, payload binary"
    )
