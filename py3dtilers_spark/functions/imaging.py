"""Pure-numpy image codec + deterministic pixel synthesis.

The container has no PIL/libjpeg, so the engine ships its own tiny codec
(the reference uses PIL: /root/reference/py3dtilers/Texture/texture.py:86-118,
atlas re-encode at atlas_node.py:110-132). Two formats:

- ``png`` rows  -> RAW1: lossless (header + raw uint8 HxWx3)
- ``jpg`` rows  -> QNT1: lossy uniform quantization, step 4 -> max abs error 2,
  PSNR ~= 46 dB, comfortably above the BASELINE.json 40 dB gate.

This keeps the *Spark-side plumbing real* (binary columns, Arrow batches,
decode/encode inside pandas UDFs, per-tile atlas packing) while the codec
itself is a stand-in, exactly as the task brief allows for absent image libs.

All functions operate on numpy arrays / python bytes and are called from
mapInPandas / applyInPandas batches — never from row-at-a-time UDFs.
"""
from __future__ import annotations

import struct

import numpy as np

MAGIC_RAW = b"RAW1"
MAGIC_QNT = b"QNT1"
_QSTEP = 4  # quantization step for lossy mode


def synth_pixels(phash: int, w: int, h: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 image derived from phash."""
    yy = np.arange(h, dtype=np.int64)[:, None]
    xx = np.arange(w, dtype=np.int64)[None, :]
    base = (yy * 7 + xx * 13 + (phash % 251)) % 256
    img = np.stack(
        [base, (base + (phash % 83)) % 256, (base + (phash % 131)) % 256], axis=-1
    )
    return img.astype(np.uint8)


def encode(img: np.ndarray, fmt: str) -> bytes:
    """Encode an (h, w, 3) uint8 array. fmt: 'png' (lossless) or 'jpg' (lossy)."""
    h, w = img.shape[0], img.shape[1]
    header = struct.pack("<HH", w, h)
    if fmt == "png":
        return MAGIC_RAW + header + img.tobytes()
    q = ((img.astype(np.uint16) + _QSTEP // 2) // _QSTEP).astype(np.uint8)
    return MAGIC_QNT + header + q.tobytes()


def decode(blob: bytes) -> np.ndarray:
    """Decode a RAW1/QNT1 blob to (h, w, 3) uint8."""
    magic, (w, h) = blob[:4], struct.unpack("<HH", blob[4:8])
    body = np.frombuffer(blob, dtype=np.uint8, offset=8).reshape(h, w, 3)
    if magic == MAGIC_RAW:
        return body.copy()
    if magic == MAGIC_QNT:
        return np.minimum(body.astype(np.uint16) * _QSTEP, 255).astype(np.uint8)
    raise ValueError(f"unknown image magic {magic!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def shelf_pack(sizes: list[tuple[int, int]], atlas_w: int) -> tuple[list[tuple[int, int]], int]:
    """First-fit-decreasing shelf packing (stand-in for the reference's
    guillotine atlas tree, /root/reference/py3dtilers/Texture/atlas_node.py:31-108,
    which sorts by area desc first, atlas.py:24-26).

    sizes: list of (w, h) in input order. Returns ([(x, y) per input], atlas_h).
    Deterministic: ties broken by input index.
    """
    order = sorted(range(len(sizes)), key=lambda i: (-sizes[i][0] * sizes[i][1], i))
    pos: list[tuple[int, int]] = [(0, 0)] * len(sizes)
    shelf_y = 0
    shelf_h = 0
    cur_x = 0
    for i in order:
        w, h = sizes[i]
        if cur_x + w > atlas_w and cur_x > 0:
            shelf_y += shelf_h
            cur_x = 0
            shelf_h = 0
        pos[i] = (cur_x, shelf_y)
        cur_x += w
        shelf_h = max(shelf_h, h)
    return pos, shelf_y + shelf_h
