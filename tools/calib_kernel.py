"""Shared bare-kernel calibration tile for the scaling evidence protocol.

One synthetic 500-member tile pushed through the REAL per-tile encode path
(decode -> shelf-pack -> atlas paste -> compress) with no Spark, no Arrow,
no shuffle. Used by:
  - bench.py's bracketing machine calibration (N vs 4N multiprocessing)
  - tools/canary.py's during-run host-weather probe

Being the job's own kernel, its throughput is directly comparable to the
job's encode phase: a window where this kernel runs at 2x below its healthy
norm is a window where the Spark job was starved by the (shared,
non-stationary) host, not by its own plan shape.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CALIB_BLOBS: list = []


def calib_tile(_i):
    """Encode one synthetic 500-member tile; returns output byte count."""
    import numpy as np

    from py3dtilers_spark.functions.imaging import (
        _scratch, decode_into, encode, shelf_pack, synth_encode_batch,
    )

    if not _CALIB_BLOBS:
        rng = np.random.default_rng(7)
        n = 500
        ph = rng.integers(0, 1 << 40, n)
        w = rng.integers(16, 65, n).astype(np.int32)
        h = rng.integers(16, 65, n).astype(np.int32)
        fmt = np.where(rng.integers(0, 4, n) == 0, "png", "jpg")
        _CALIB_BLOBS.append((synth_encode_batch(ph, w, h, fmt), list(zip(w, h))))
    blobs, sizes = _CALIB_BLOBS[0]
    pos, atlas_h = shelf_pack(sizes, 1024)
    atlas = _scratch("atlas", (int(atlas_h), 1024, 3), np.uint8)
    atlas.fill(0)
    for (px, py), (ww, hh), b in zip(pos, sizes, blobs):
        decode_into(b, atlas[py : py + hh, px : px + ww])
    return len(encode(atlas, "png"))
