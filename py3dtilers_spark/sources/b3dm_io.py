"""Minimal real b3dm / binary-glTF (GLB) round-trip (S5 / K1 / G11).

Writes the actual 3D Tiles b3dm container the reference emits through
py3dtiles (b3dm header + feature/batch table JSON + GLB payload) and reads
it back with numpy ``frombuffer`` accessor slicing — the vectorized
inversion of the reference's per-12-byte ``struct.unpack`` loop
(/root/reference/py3dtilers/TilesetReader/reader_utils.py:16-78).

Scope: one mesh, one primitive, POSITION (float32 vec3) + _BATCHID
(float32 scalar) accessors — exactly the attributes the reference's reader
consumes for untextured tiles. Spark surface: ``encode_b3dm`` runs inside
the per-tile Arrow batch (binary column out), ``decode_b3dm`` inside
``mapInPandas`` on read-back.
"""
from __future__ import annotations

import json
import struct

import numpy as np

_GLB_MAGIC = 0x46546C67  # 'glTF'
_JSON_CHUNK = 0x4E4F534A  # 'JSON'
_BIN_CHUNK = 0x004E4942  # 'BIN\0'


def _pad(b: bytes, align: int = 4, fill: bytes = b" ") -> bytes:
    return b + fill * (-len(b) % align)


def flat_normals(positions: np.ndarray) -> np.ndarray:
    """Per-vertex NORMAL array for a triangle soup: the G7 kernel's
    per-triangle unit normals (operators/geometry.py:203) replicated to the
    triangle's three vertices — flat shading, exactly the reference's
    feature.geom.compute_normals() emitted into tile content
    (Common/tileset_creation.py:218)."""
    from ..operators.geometry import triangle_normals

    pos = np.ascontiguousarray(positions, dtype=np.float64).reshape(-1, 3, 3)
    unit, _ = triangle_normals(pos)
    return np.repeat(unit, 3, axis=0).astype(np.float32)


def encode_glb(
    positions: np.ndarray,
    batch_ids: np.ndarray,
    uvs: np.ndarray | None = None,
    colors: np.ndarray | None = None,
    normals: np.ndarray | None = None,
    image: bytes | None = None,
    mime: str = "image/png",
) -> bytes:
    """positions (N,3) + batch_ids (N,) float32, optional TEXCOORD_0 uvs
    (N,2), COLOR_0 (N,3) and an embedded texture image -> GLB bytes.

    The textured form matches what the reference reads back
    (TilesetReader/reader_utils.py:35-56 TEXCOORD_0/COLOR_0 accessors): the
    image rides the binary chunk via its own bufferView, referenced by
    images[0] -> textures[0] -> materials[0].pbrMetallicRoughness
    .baseColorTexture, and the primitive points at material 0."""
    pos = np.ascontiguousarray(positions, dtype=np.float32)
    bid = np.ascontiguousarray(batch_ids, dtype=np.float32)
    n = len(pos)

    parts: list[bytes] = []
    views: list[dict] = []
    offset = 0

    def add_view(raw: bytes) -> int:
        nonlocal offset
        views.append({"buffer": 0, "byteOffset": offset, "byteLength": len(raw)})
        padded = _pad(raw, 4, b"\0")
        parts.append(padded)
        offset += len(padded)
        return len(views) - 1

    accessors = [
        {
            "bufferView": add_view(pos.tobytes()), "byteOffset": 0,
            "componentType": 5126, "count": n, "type": "VEC3",
            "min": [float(v) for v in pos.min(axis=0)] if n else [0, 0, 0],
            "max": [float(v) for v in pos.max(axis=0)] if n else [0, 0, 0],
        },
        {
            "bufferView": add_view(bid.tobytes()), "byteOffset": 0,
            "componentType": 5126, "count": n, "type": "SCALAR",
        },
    ]
    attributes = {"POSITION": 0, "_BATCHID": 1}
    if uvs is not None:
        uv = np.ascontiguousarray(uvs, dtype=np.float32)
        attributes["TEXCOORD_0"] = len(accessors)
        accessors.append(
            {
                "bufferView": add_view(uv.tobytes()), "byteOffset": 0,
                "componentType": 5126, "count": len(uv), "type": "VEC2",
            }
        )
    if colors is not None:
        col = np.ascontiguousarray(colors, dtype=np.float32)
        attributes["COLOR_0"] = len(accessors)
        accessors.append(
            {
                "bufferView": add_view(col.tobytes()), "byteOffset": 0,
                "componentType": 5126, "count": len(col), "type": "VEC3",
            }
        )
    if normals is not None:
        nrm = np.ascontiguousarray(normals, dtype=np.float32)
        attributes["NORMAL"] = len(accessors)
        accessors.append(
            {
                "bufferView": add_view(nrm.tobytes()), "byteOffset": 0,
                "componentType": 5126, "count": len(nrm), "type": "VEC3",
            }
        )

    prim = {"attributes": attributes, "mode": 4}
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [prim]}],
        "accessors": accessors,
    }
    if image is not None:
        img_view = add_view(image)
        gltf["images"] = [{"bufferView": img_view, "mimeType": mime}]
        gltf["samplers"] = [{"magFilter": 9729, "minFilter": 9729}]
        gltf["textures"] = [{"source": 0, "sampler": 0}]
        gltf["materials"] = [
            {"pbrMetallicRoughness": {"baseColorTexture": {"index": 0}}}
        ]
        prim["material"] = 0

    bin_chunk = b"".join(parts)
    gltf["buffers"] = [{"byteLength": len(bin_chunk)}]
    gltf["bufferViews"] = views
    json_chunk = _pad(json.dumps(gltf, separators=(",", ":")).encode())
    total = 12 + 8 + len(json_chunk) + 8 + len(bin_chunk)
    return b"".join(
        [
            struct.pack("<III", _GLB_MAGIC, 2, total),
            struct.pack("<II", len(json_chunk), _JSON_CHUNK),
            json_chunk,
            struct.pack("<II", len(bin_chunk), _BIN_CHUNK),
            bin_chunk,
        ]
    )


def decode_glb_full(blob: bytes) -> dict:
    """GLB -> {'pos', 'bid', 'uv', 'color', 'image', 'mime', 'material'}
    (uv/color/image None when the accessor/texture is absent). Accessor
    reads are ONE numpy frombuffer each — the vectorized inversion of the
    reference's per-element struct.unpack loops (reader_utils.py:32-66)."""
    magic, version, _ = struct.unpack_from("<III", blob, 0)
    if magic != _GLB_MAGIC or version != 2:
        raise ValueError("not a GLB v2 blob")
    off = 12
    gltf = None
    binary = b""
    while off < len(blob):
        clen, ctype = struct.unpack_from("<II", blob, off)
        off += 8
        chunk = blob[off : off + clen]
        off += clen
        if ctype == _JSON_CHUNK:
            gltf = json.loads(chunk.decode())
        elif ctype == _BIN_CHUNK:
            binary = chunk
    prim = gltf["meshes"][0]["primitives"][0]
    attrs = prim["attributes"]

    def _accessor(idx, ncomp):
        acc = gltf["accessors"][idx]
        bv = gltf["bufferViews"][acc["bufferView"]]
        start = bv.get("byteOffset", 0) + acc.get("byteOffset", 0)
        count = acc["count"]
        # vectorized: ONE frombuffer per accessor, not a per-element loop
        return np.frombuffer(binary, dtype=np.float32, count=count * ncomp, offset=start)

    out = {
        "pos": _accessor(attrs["POSITION"], 3).reshape(-1, 3),
        "bid": _accessor(attrs["_BATCHID"], 1),
        "uv": None,
        "color": None,
        "normal": None,
        "image": None,
        "mime": None,
        "material": prim.get("material"),
    }
    if "TEXCOORD_0" in attrs:
        out["uv"] = _accessor(attrs["TEXCOORD_0"], 2).reshape(-1, 2)
    if "COLOR_0" in attrs:
        out["color"] = _accessor(attrs["COLOR_0"], 3).reshape(-1, 3)
    if "NORMAL" in attrs:
        out["normal"] = _accessor(attrs["NORMAL"], 3).reshape(-1, 3)
    if prim.get("material") is not None and gltf.get("images"):
        tex = gltf["materials"][prim["material"]]["pbrMetallicRoughness"][
            "baseColorTexture"
        ]["index"]
        img = gltf["images"][gltf["textures"][tex]["source"]]
        bv = gltf["bufferViews"][img["bufferView"]]
        start = bv.get("byteOffset", 0)
        out["image"] = binary[start : start + bv["byteLength"]]
        out["mime"] = img.get("mimeType")
    return out


def decode_glb(blob: bytes):
    """GLB -> (positions (N,3) float32, batch_ids (N,) float32)."""
    full = decode_glb_full(blob)
    return full["pos"], full["bid"]


def encode_b3dm(
    positions: np.ndarray,
    batch_ids: np.ndarray,
    batch_table: dict,
    uvs: np.ndarray | None = None,
    colors: np.ndarray | None = None,
    normals: "np.ndarray | str | None" = "auto",
    image: bytes | None = None,
    mime: str = "image/png",
) -> bytes:
    """b3dm container (28-byte header + FeatureTable/BatchTable JSON + GLB),
    the tile-content format py3dtiles writes for the reference. Pass uvs +
    image for a textured tile (TEXCOORD_0 + embedded atlas material).
    normals: "auto" (default) computes flat per-triangle normals from the
    position soup — the reference always emits normals into tile content
    (tileset_creation.py:218 compute_normals); pass None to omit or an
    (N,3) array to override."""
    n_batch = int(batch_ids.max()) + 1 if len(batch_ids) else 0
    ft = _pad(json.dumps({"BATCH_LENGTH": n_batch}, separators=(",", ":")).encode())
    bt = _pad(json.dumps(batch_table, separators=(",", ":")).encode())
    if isinstance(normals, str) and normals == "auto":
        normals = flat_normals(positions) if len(positions) % 3 == 0 and len(positions) else None
    glb = encode_glb(positions, batch_ids, uvs=uvs, colors=colors,
                     normals=normals, image=image, mime=mime)
    total = 28 + len(ft) + len(bt) + len(glb)
    header = struct.pack("<4sIIIIII", b"b3dm", 1, total, len(ft), 0, len(bt), 0)
    return header + ft + bt + glb


def decode_b3dm(blob: bytes):
    """b3dm -> (positions, batch_ids, feature_table dict, batch_table dict)."""
    pos, bid, ft, bt, _ = decode_b3dm_full(blob)
    return pos, bid, ft, bt


B3DM_SCAN_SCHEMA = (
    "path string, batch_id int, feature_id string,"
    " n_verts int, xmin double, xmax double, ymin double, ymax double,"
    " zmin double, zmax double,"
    " has_uv boolean, has_color boolean, has_normal boolean,"
    " atlas binary, mime string"
)


def read_b3dm_tiles(spark, tiles_dir: str):
    """S5: distributed scan of a directory of .b3dm tile files back into
    per-feature rows (the reference's TilesetReader walk,
    TilesetReader/reader_utils.py:9-78 + tile_to_feature.py:114-132, which
    unpacks glTF accessors 4 bytes at a time on one thread). Here
    ``binaryFile`` splits the file set across tasks and each blob decodes
    with numpy frombuffer slices inside one mapInPandas stage; vertices are
    regrouped per _BATCHID with a vectorized sort+reduceat, never a per-
    vertex Python loop. Emits per-feature vertex counts + bboxes, UV/color
    presence, and the embedded atlas when the tile is textured."""
    import pandas as pd

    src = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.b3dm")
        .load(tiles_dir)
        .select("path", "content")
    )

    def scan(batches):
        for pdf in batches:
            rows = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                pos, bid, ft, bt, full = decode_b3dm_full(bytes(blob))
                ids = bt.get("ids", [])
                order = np.argsort(bid, kind="stable")
                sbid = bid[order].astype(np.int64)
                spos = pos[order]
                uniq, starts = np.unique(sbid, return_index=True)
                bounds = np.append(starts, len(sbid))
                for k, b in enumerate(uniq):
                    seg = spos[bounds[k] : bounds[k + 1]]
                    rows.append(
                        {
                            "path": path,
                            "batch_id": int(b),
                            "feature_id": ids[int(b)] if int(b) < len(ids) else None,
                            "n_verts": len(seg),
                            "xmin": float(seg[:, 0].min()),
                            "xmax": float(seg[:, 0].max()),
                            "ymin": float(seg[:, 1].min()),
                            "ymax": float(seg[:, 1].max()),
                            "zmin": float(seg[:, 2].min()),
                            "zmax": float(seg[:, 2].max()),
                            "has_uv": full["uv"] is not None,
                            "has_color": full["color"] is not None,
                            "has_normal": full["normal"] is not None,
                            "atlas": full["image"],
                            "mime": full["mime"],
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "path", "batch_id", "feature_id", "n_verts",
                    "xmin", "xmax", "ymin", "ymax", "zmin", "zmax",
                    "has_uv", "has_color", "has_normal", "atlas", "mime",
                ],
            )

    return src.mapInPandas(scan, B3DM_SCAN_SCHEMA)


def decode_b3dm_full(blob: bytes):
    """b3dm -> (positions, batch_ids, feature_table, batch_table, glb_full)
    where glb_full is decode_glb_full's dict (uv / color / image / mime)."""
    magic, version, _, ftj, ftb, btj, btb = struct.unpack_from("<4sIIIIII", blob, 0)
    if magic != b"b3dm" or version != 1:
        raise ValueError("not a b3dm v1 blob")
    off = 28
    ft = json.loads(blob[off : off + ftj].decode()) if ftj else {}
    off += ftj + ftb
    bt = json.loads(blob[off : off + btj].decode()) if btj else {}
    off += btj + btb
    full = decode_glb_full(blob[off:])
    return full["pos"], full["bid"], ft, bt, full
