"""Textured b3dm round-trip (S5/G11 textured path): TEXCOORD_0 accessor +
embedded atlas image + material through the standard container, mirroring
the reference's textured read-back
(/root/reference/py3dtilers/TilesetReader/reader_utils.py:35-56 and
tests/test_tilesetReader.py:39): UVs byte-exact, pixels byte-exact for
lossless atlases and PSNR >= 40 for lossy ones."""
import numpy as np
import pandas as pd

from py3dtilers_spark.functions.imaging import decode, encode, psnr
from py3dtilers_spark.sources.b3dm_io import (
    decode_b3dm_full,
    encode_b3dm,
)

W = H = 64


def _tile(fmt: str):
    rng = np.random.default_rng(11)
    if fmt == "png":
        atlas = rng.integers(0, 256, size=(H, W, 3), dtype=np.uint8)
    else:
        # smooth gradient so jpg stays above the PSNR gate
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
        atlas = np.stack(
            [xx * 2, yy * 2, (xx + yy)], axis=-1
        ).astype(np.uint8)
    boxes = [(0, 0, 32, 32), (32, 0, 32, 32), (0, 32, 32, 32), (32, 32, 32, 32)]
    pos, uv, bid = [], [], []
    for i, (x, y, w, h) in enumerate(boxes):
        # one textured quad (2 triangles) per feature
        u0, v0 = x / W, y / H
        u1, v1 = (x + w) / W, (y + h) / H
        quad = [(0, 0), (w, 0), (w, h), (0, 0), (w, h), (0, h)]
        quv = [(u0, v0), (u1, v0), (u1, v1), (u0, v0), (u1, v1), (u0, v1)]
        for (px, py), q in zip(quad, quv):
            pos.append((px + i * 100.0, py, 0.0))
            uv.append(q)
            bid.append(float(i))
    batch_table = {
        "ids": [f"f{i}" for i in range(4)],
        "uv": [list(b) for b in boxes],
        "fmt": fmt,
    }
    img = encode(atlas, fmt)
    blob = encode_b3dm(
        np.array(pos, dtype=np.float32),
        np.array(bid, dtype=np.float32),
        batch_table,
        uvs=np.array(uv, dtype=np.float32),
        image=img,
        mime="image/png" if fmt == "png" else "image/jpeg",
    )
    return atlas, img, np.array(uv, dtype=np.float32), blob


def test_textured_roundtrip_lossless():
    atlas, img, uv, blob = _tile("png")
    pos, bid, ft, bt, full = decode_b3dm_full(blob)
    assert ft["BATCH_LENGTH"] == 4 and bt["ids"] == [f"f{i}" for i in range(4)]
    assert np.array_equal(full["uv"], uv)  # byte-exact TEXCOORD_0
    assert full["mime"] == "image/png" and full["material"] == 0
    # NORMAL accessor (round-4: the reference always emits normals into
    # tile content, tileset_creation.py:218): auto-computed flat normals
    # survive the container byte-exact and equal the G7 kernel's output
    from py3dtilers_spark.operators.geometry import triangle_normals
    from py3dtilers_spark.sources.b3dm_io import flat_normals

    assert full["normal"] is not None and full["normal"].shape == pos.shape
    assert np.array_equal(full["normal"], flat_normals(pos))
    unit, _ = triangle_normals(pos.astype(np.float64).reshape(-1, 3, 3))
    assert np.array_equal(
        full["normal"], np.repeat(unit, 3, axis=0).astype(np.float32)
    )
    # all quads lie in z=0 plane wound CCW -> +z normals
    assert np.array_equal(full["normal"][:, 2], np.ones(len(pos), np.float32))
    assert full["image"] == img  # embedded atlas byte-exact
    assert np.array_equal(decode(full["image"]), atlas)  # pixel-exact
    # per-feature crops via the batch-table uv boxes match the source atlas
    dec = decode(full["image"])
    for (x, y, w, h) in bt["uv"]:
        assert np.array_equal(dec[y : y + h, x : x + w], atlas[y : y + h, x : x + w])


def test_textured_roundtrip_lossy_psnr():
    atlas, img, uv, blob = _tile("jpg")
    _, _, _, _, full = decode_b3dm_full(blob)
    assert np.array_equal(full["uv"], uv)
    assert psnr(decode(full["image"]), atlas) >= 40.0


def test_textured_tiles_through_spark(spark):
    """The textured decode runs vectorized inside mapInPandas, one Arrow
    batch carrying several textured tiles (the reference reads tiles one
    file at a time; here a partition streams them)."""
    atlas, img, uv, blob = _tile("png")
    pdf = pd.DataFrame({"tile_id": [f"t{i}" for i in range(3)], "b3dm": [blob] * 3})
    df = spark.createDataFrame(pdf)

    def verify(batches):
        for b in batches:
            ok = []
            for blob_ in b["b3dm"]:
                p, bi, ft, bt, full = decode_b3dm_full(bytes(blob_))
                ok.append(
                    bool(np.array_equal(full["uv"], uv))
                    and full["image"] == img
                    and len(p) == 24
                )
            yield pd.DataFrame({"tile_id": b["tile_id"], "ok": ok})

    out = df.mapInPandas(verify, "tile_id string, ok boolean").toPandas()
    assert out["ok"].all() and len(out) == 3


def test_untextured_still_decodes():
    """Backward compatibility: tiles without uvs/image keep the old shape."""
    pos = np.zeros((3, 3), dtype=np.float32)
    bid = np.zeros(3, dtype=np.float32)
    blob = encode_b3dm(pos, bid, {"ids": ["a"]})
    p, b, ft, bt, full = decode_b3dm_full(blob)
    assert full["uv"] is None and full["image"] is None and full["material"] is None


def test_read_b3dm_tiles_scan(spark, tmp_path):
    """S5 full scan: a directory of .b3dm files -> per-feature rows through
    binaryFile + vectorized decode (reference TilesetReader semantics)."""
    from py3dtilers_spark.sources.b3dm_io import read_b3dm_tiles

    d = tmp_path / "tiles"
    d.mkdir()
    # textured tile (4 features, quads at x offsets i*100)
    atlas, img, uv, blob = _tile("png")
    (d / "t0.b3dm").write_bytes(blob)
    # untextured tile: 2 features, 3 verts each
    pos = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [5, 5, 5], [6, 5, 5], [5, 6, 7]],
        dtype=np.float32,
    )
    bid = np.array([0, 0, 0, 1, 1, 1], dtype=np.float32)
    (d / "t1.b3dm").write_bytes(
        encode_b3dm(pos, bid, {"ids": ["g0", "g1"]})
    )
    (d / "ignored.txt").write_bytes(b"not a tile")

    rows = read_b3dm_tiles(spark, str(d)).collect()
    by_key = {(r["path"].split("/")[-1], r["batch_id"]): r for r in rows}
    assert len(by_key) == 6  # 4 + 2 features
    # auto-computed flat normals are present in both tiles' containers
    assert all(r["has_normal"] for r in rows)
    r = by_key[("t0.b3dm", 2)]
    assert r["feature_id"] == "f2" and r["n_verts"] == 6
    assert r["has_uv"] and not r["has_color"]
    assert bytes(r["atlas"]) == img and r["mime"] == "image/png"
    assert (r["xmin"], r["xmax"]) == (200.0, 232.0)  # quad i=2 at x offset 200
    u = by_key[("t1.b3dm", 1)]
    assert u["feature_id"] == "g1" and u["n_verts"] == 3
    assert not u["has_uv"] and u["atlas"] is None
    assert (u["zmin"], u["zmax"]) == (5.0, 7.0)
