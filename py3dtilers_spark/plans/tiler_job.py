"""End-to-end tiling pipeline: the engine's equivalent of
create_tileset_from_feature_list (/root/reference/py3dtilers/Common/tiler.py:231-271)
+ FromGeometryTreeToTileset (tileset_creation.py:27-139), restructured as five
DataFrame stages (SURVEY.md section 7.1):

  scan features -> kd partition -> per-tile encode (applyInPandas) ->
  hierarchy roll-up -> manifest + lineage

Unlike the reference (which interleaves per-tile SQL fetch + encode + file
write on one thread, the N+1 pattern of CityTiler.py:76-96), geometry/payload
flows through ONE scan and ONE shuffle keyed by tile_id; every tile encodes in
parallel; the driver only writes the (tiny) manifest.

Checkpoint/lineage (north rule; no reference counterpart): every encoded tile
appends a lineage row (run_id, cell_id=tile_id, row_count, checksum). A
resumed run anti-joins completed tile ids and encodes only the remainder,
producing byte-identical output to an uninterrupted run (tile encode is a
deterministic function of the tile's member rows).
"""
from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..data.features import features_df
from ..functions.imaging import _scratch, decode, encode, shelf_pack
from ..operators.hierarchy import tile_tree, write_manifest
from ..operators.kd_tree import kd_assign

ENCODED_SCHEMA = (
    "tile_id string, n_features bigint, atlas binary, atlas_w int, atlas_h int,"
    " batch_json string, checksum string"
)


def encode_tile(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-tile encoder (reference __create_tile_content,
    tileset_creation.py:141-194 + atlas pack, Texture/atlas.py:52-88):
    decode member images, shelf-pack into one atlas, re-encode (lossless iff
    every member is lossless), emit batch table json + checksum.

    Runs as one applyInPandas task per tile — all images of a tile are
    co-partitioned by the kd shuffle, exactly the reference's invariant that
    a tile's textures are atlased together."""
    pdf = pdf.sort_values("image_id", kind="mergesort").reset_index(drop=True)
    tile_id = pdf["tile_id"].iloc[0]
    imgs = [decode(bytes(b)) for b in pdf["bytes"]]
    sizes = [(im.shape[1], im.shape[0]) for im in imgs]
    atlas_w = 1024
    pos, atlas_h = shelf_pack(sizes, atlas_w)
    # reused per-worker buffer: avoids faulting fresh pages per tile
    atlas = _scratch("atlas", (atlas_h, atlas_w, 3), np.uint8)
    atlas.fill(0)
    for (px, py), im in zip(pos, imgs):
        atlas[py : py + im.shape[0], px : px + im.shape[1]] = im
    fmt = "png" if (pdf["fmt"] == "png").all() else "jpg"
    blob = encode(atlas, fmt)
    batch = {
        "ids": pdf["image_id"].tolist(),
        "captions": pdf["caption"].tolist(),
        "uv": [[int(x), int(y), int(w), int(h)] for (x, y), (w, h) in zip(pos, sizes)],
        "fmt": fmt,
    }
    h = hashlib.sha256()
    for iid, cap in zip(pdf["image_id"], pdf["caption"]):
        h.update(iid.encode())
        h.update(cap.encode())
    return pd.DataFrame(
        [
            {
                "tile_id": tile_id,
                "n_features": len(pdf),
                "atlas": blob,
                "atlas_w": atlas_w,
                "atlas_h": int(atlas_h),
                "batch_json": json.dumps(batch),
                "checksum": h.hexdigest(),
            }
        ]
    )


def run_tiler(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    kd_tree_max: int = 500,
    exact: bool = True,
    with_payload: bool = True,
    run_id: str = "run0",
    resume: bool = False,
    fail_after_tiles: int | None = None,
    features: "DataFrame | None" = None,
) -> dict:
    """Execute the pipeline; returns summary metrics (incl. per-phase secs).

    fail_after_tiles: test hook — encode only the first K tiles (by path
    order) then 'crash', leaving a partial lineage for resume tests.
    """
    import time

    timings: dict[str, float] = {}
    _t = time.time
    # kd + hierarchy run on the byte-free projection: mapInPandas (the
    # payload generator/decoder) is a column-pruning barrier, so any plan
    # that "selects a few columns" downstream of it would still materialize
    # every payload byte. Payload bytes are produced exactly once, on the
    # encode branch, and shuffled exactly once (the assignment join) — at
    # 100 TB payload bytes dominate, so this is the difference between 1x
    # and depth-x payload generation + shuffle volume.
    t0 = _t()
    src = features if features is not None else features_df(spark, sf_dir, with_bytes=False)
    base = src.select(
        "image_id", "x", "y", "z", "w", "h", "fmt", "caption", "phash"
    ).persist()  # consumed by both the kd branch and the payload branch
    slim = kd_assign(
        base.select("image_id", "x", "y", "z"),
        kd_tree_max=kd_tree_max,
        exact=exact,
    )
    # consumed twice (hierarchy + assignment join); it is tiny (id + coords)
    slim = slim.localCheckpoint(eager=True)
    timings["kd"] = _t() - t0
    if with_payload:
        from ..data.synth_images import attach_bytes

        # project to the minimal column set BEFORE the Arrow UDF boundary —
        # mapInPandas blocks column pruning, so the projection must be
        # upstream of it. Explicit repartition: AQE coalesces the (tiny)
        # columnar input to a handful of partitions, which would serialize
        # the payload UDF whose OUTPUT is ~100x bigger — size the stage for
        # its output, not its input.
        n_parts = spark.sparkContext.defaultParallelism * 2
        feats = attach_bytes(
            base.select("image_id", "w", "h", "fmt", "caption", "phash")
            .repartition(n_parts, "image_id")
        )
        tiled = feats.select("image_id", "fmt", "caption", "bytes").join(
            slim.select("image_id", "tile_id"), "image_id"
        )
    else:
        tiled = slim

    tiles_dir = os.path.join(out_dir, "tiles")
    lineage_dir = os.path.join(out_dir, "lineage")

    # the tree is tiny (~2x leaf count rows) and consumed three times
    # (leaf count, root stats, manifest collect) — materialize it once
    t0 = _t()
    tree = tile_tree(slim.select("tile_id", "x", "y", "z")).localCheckpoint(eager=True)
    n_leaves = tree.where("is_leaf").count()
    n_features = tree.where("tile_id = ''").collect()[0]["n_features"]
    timings["tree"] = _t() - t0

    if with_payload:
        todo = tiled
        if resume and os.path.exists(lineage_dir):
            done = spark.read.parquet(lineage_dir).where(
                F.col("run_id") == run_id
            ).select("cell_id").withColumnRenamed("cell_id", "tile_id")
            todo = tiled.join(F.broadcast(done), "tile_id", "left_anti")
        if fail_after_tiles is not None:
            keep = [
                r["tile_id"]
                for r in sorted(
                    todo.select("tile_id").distinct().collect(),
                    key=lambda r: r["tile_id"],
                )[:fail_after_tiles]
            ]
            todo = todo.where(F.col("tile_id").isin(keep))
        t0 = _t()
        encoded = todo.groupBy("tile_id").applyInPandas(encode_tile, ENCODED_SCHEMA)
        encoded.write.mode("append").parquet(tiles_dir)
        timings["encode_write"] = _t() - t0
        t0 = _t()
        lineage = (
            # parquet column pruning: the heavy atlas column is never read
            spark.read.parquet(tiles_dir)
            .select(
                F.lit(run_id).alias("run_id"),
                F.col("tile_id").alias("cell_id"),
                F.col("n_features").alias("row_count"),
                "checksum",
                F.current_timestamp().alias("completed_at"),
            )
        )
        lineage.write.mode("overwrite").parquet(lineage_dir)
        timings["lineage"] = _t() - t0

    t0 = _t()
    os.makedirs(out_dir, exist_ok=True)
    write_manifest(tree, os.path.join(out_dir, "tileset.json"))
    timings["manifest"] = _t() - t0
    base.unpersist()
    return {
        "n_features": int(n_features),
        "n_tiles": int(n_leaves),
        "timings": {k: round(v, 2) for k, v in timings.items()},
    }
