#!/usr/bin/env python
"""Spark-free microbench: does the per-tile encode kernel itself scale 4->16
processes on this host? Variants isolate suspected page-fault costs:

  v0  current kernel: atlas.tobytes() + zlib.compress  (fresh 10-25MB/tile)
  v1  zero-copy: zlib.compress(memoryview(atlas))      (no tobytes copy)
  v2  v1 + MALLOC_TRIM_THRESHOLD_=-1 MALLOC_MMAP_THRESHOLD_=1GB (workers keep pages)

Each task = synth 2000 members (64x64 padded), member zlib encode+decode,
paste into atlas, atlas compress — the exact encode_tile work shape.
"""
from __future__ import annotations

import multiprocessing as mp
import os
import sys
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


_BLOB_CACHE: dict = {}


def _make_blobs(seed: int, n: int):
    from py3dtilers_spark.functions.imaging import synth_encode_batch

    rng = np.random.default_rng(seed)
    ph = rng.integers(0, 1 << 40, n)
    w = rng.integers(16, 65, n).astype(np.int32)
    h = rng.integers(16, 65, n).astype(np.int32)
    fmt = np.where(rng.integers(0, 4, n) == 0, "png", "jpg")
    return synth_encode_batch(ph, w, h, fmt)


def tile_task(args):
    variant, seed = args
    from py3dtilers_spark.functions.imaging import _scratch, decode, shelf_pack

    n = 500 if variant in (3, 5) else 2000
    if variant in (4, 5):
        # decode-only kernel: member blobs pre-exist (the materialized-input
        # pipeline shape); reuse one cached blob set per worker
        if n not in _BLOB_CACHE:
            _BLOB_CACHE[n] = _make_blobs(7, n)
        blobs = _BLOB_CACHE[n]
    else:
        blobs = _make_blobs(seed, n)
    imgs = [decode(b) for b in blobs]
    sizes = [(im.shape[1], im.shape[0]) for im in imgs]
    pos, atlas_h = shelf_pack(sizes, 1024)
    atlas = _scratch("atlas", (atlas_h, 1024, 3), np.uint8)
    atlas.fill(0)
    for (px, py), im in zip(pos, imgs):
        atlas[py : py + im.shape[0], px : px + im.shape[1]] = im
    if variant == 0:
        blob = zlib.compress(atlas.tobytes(), 1)
    else:
        blob = zlib.compress(atlas, 1)
    return len(blob)


def run(variant: int, nproc: int, ntasks: int) -> float:
    with mp.Pool(nproc) as p:
        p.map(tile_task, [(variant, 10_000 + i) for i in range(nproc)])  # warm
        t0 = time.time()
        p.map(tile_task, [(variant, i) for i in range(ntasks)], chunksize=1)
        return ntasks / (time.time() - t0)


def main():
    variant = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    ntasks = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    if variant == 2:
        os.environ["MALLOC_TRIM_THRESHOLD_"] = "-1"
        os.environ["MALLOC_MMAP_THRESHOLD_"] = str(1 << 30)
    out = {}
    for nproc in (4, 16, 4, 16):
        tps = run(variant, nproc, ntasks)
        out.setdefault(nproc, []).append(tps)
        print(f"v{variant} nproc={nproc:2d} tiles/sec={tps:7.2f}", flush=True)
    lo = max(out[4]); hi = max(out[16])
    print(f"v{variant} best eff 4->16: {hi / lo / 4.0:.3f}")


if __name__ == "__main__":
    main()
