"""Multimodal binary columns: audio + video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages —
the same shape as the image path (functions/imaging.py), which is fully
real. The audio/video DECODERS are deliberately stubbed (no codec libs in
this container): `decode_audio_pcm` / `decode_video_frames` raise
``NotImplementedError`` for real containers and fall back to a
DETERMINISTIC fake derived from the payload hash for blobs produced by
`synth_audio` / `synth_video` — so the Spark-side plumbing (schemas,
partitioning, UDF signatures, Arrow batch shapes, windowed feature math)
is real and tested end to end, and swapping in soundfile/PyAV later only
replaces the two decode functions.

Schemas (the typed-metadata convention for opaque media columns):
  audio:  (media_id string, bytes binary, sample_rate int, n_channels int,
           n_samples bigint, codec string)
  video:  (media_id string, bytes binary, fps double, n_frames int,
           w int, h int, codec string)
"""
from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_SYNTH_AUDIO_MAGIC = b"SAU1"
_SYNTH_VIDEO_MAGIC = b"SVI1"


# ---------------------------------------------------------------- synthesis

def synth_audio(seed: int, n_samples: int, sample_rate: int = 16000) -> bytes:
    """Deterministic fake audio container: magic + seed + length. The
    'signal' is derived from the seed at decode time — the blob itself
    stays tiny, standing in for an opaque compressed payload."""
    return _SYNTH_AUDIO_MAGIC + struct.pack("<qiq", seed, sample_rate, n_samples)


def synth_video(seed: int, n_frames: int, w: int = 32, h: int = 24) -> bytes:
    return _SYNTH_VIDEO_MAGIC + struct.pack("<qiii", seed, n_frames, w, h)


# ----------------------------------------------------------------- decoders

def decode_audio_pcm(blob: bytes) -> np.ndarray:
    """blob -> float32 PCM in [-1, 1). Real codecs (wav/flac/mp3) need
    soundfile/librosa — not in this container."""
    if blob[:4] == _SYNTH_AUDIO_MAGIC:
        seed, _sr, n = struct.unpack_from("<qiq", blob, 4)
        # xorshift-free deterministic fake: hash-seeded generator
        rng = np.random.default_rng(seed & 0x7FFFFFFF)
        t = np.arange(n, dtype=np.float32)
        f = 55.0 * (1 + (seed % 7))
        return (0.5 * np.sin(2 * np.pi * f * t / 16000.0)
                + 0.1 * rng.standard_normal(n).astype(np.float32))
    raise NotImplementedError(
        "real audio decode requires soundfile/librosa (absent in this "
        "container); only synth_audio blobs decode here"
    )


def decode_video_frames(blob: bytes, frame_idx: np.ndarray) -> np.ndarray:
    """blob + frame indices -> (k, h, w) uint8 grayscale frames. Real
    containers (mp4/webm) need PyAV/ffmpeg — not in this container."""
    if blob[:4] == _SYNTH_VIDEO_MAGIC:
        seed, n_frames, w, h = struct.unpack_from("<qiii", blob, 4)
        out = np.empty((len(frame_idx), h, w), dtype=np.uint8)
        yy, xx = np.mgrid[0:h, 0:w]
        for k, fi in enumerate(frame_idx):
            # per-frame deterministic pattern: phase-shifted gradient
            out[k] = ((xx * 3 + yy * 5 + seed % 251 + int(fi) * 7) % 256).astype(
                np.uint8
            )
        return out
    raise NotImplementedError(
        "real video decode requires PyAV/ffmpeg (absent in this container); "
        "only synth_video blobs decode here"
    )


# ------------------------------------------------------------- Spark stages

AUDIO_FEATURE_SCHEMA = (
    "media_id string, win int, rms_e6 bigint, zero_crossings bigint"
)


def audio_features(df: DataFrame, win_samples: int = 4000) -> DataFrame:
    """Windowed audio features over the opaque bytes column: per window,
    RMS energy (integer micro-units — oracle-safe) and zero-crossing
    count. One mapInPandas stage; each Arrow batch decodes its blobs once
    and runs pure-numpy window reductions (no per-sample Python)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["bytes"]):
                pcm = decode_audio_pcm(bytes(blob))
                n_win = len(pcm) // win_samples
                if n_win == 0:
                    continue
                w = pcm[: n_win * win_samples].reshape(n_win, win_samples)
                rms = np.sqrt((w.astype(np.float64) ** 2).mean(axis=1))
                zc = (np.diff(np.signbit(w), axis=1) != 0).sum(axis=1)
                for i in range(n_win):
                    rows.append(
                        (mid, i, int(round(rms[i] * 1e6)), int(zc[i]))
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "win", "rms_e6", "zero_crossings"]
            )

    return df.select("media_id", "bytes").mapInPandas(gen, AUDIO_FEATURE_SCHEMA)


VIDEO_SAMPLE_SCHEMA = (
    "media_id string, frame_idx int, mean_intensity_e3 bigint, w int, h int"
)


def video_frame_sample(df: DataFrame, every_k: int = 10) -> DataFrame:
    """Frame sampling + per-frame feature over opaque video bytes: every
    k-th frame index is selected from the metadata (no decode needed for
    the selection), then only the SELECTED frames decode — the pattern
    that matters at 100 TB, where decoding all frames to sample 1/10th
    is the classic waste. Emits integer mean intensity (milli-units)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob, n_frames in zip(
                pdf["media_id"], pdf["bytes"], pdf["n_frames"]
            ):
                idx = np.arange(0, int(n_frames), every_k, dtype=np.int64)
                frames = decode_video_frames(bytes(blob), idx)
                means = frames.reshape(len(idx), -1).mean(axis=1)
                for fi, m in zip(idx, means):
                    rows.append(
                        (
                            mid, int(fi), int(round(m * 1000)),
                            frames.shape[2], frames.shape[1],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "mean_intensity_e3", "w", "h"],
            )

    return df.select("media_id", "bytes", "n_frames").mapInPandas(
        gen, VIDEO_SAMPLE_SCHEMA
    )
