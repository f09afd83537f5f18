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


def encode_glb(positions: np.ndarray, batch_ids: np.ndarray) -> bytes:
    """positions: (N, 3) float32; batch_ids: (N,) float32 -> GLB bytes."""
    pos = np.ascontiguousarray(positions, dtype=np.float32)
    bid = np.ascontiguousarray(batch_ids, dtype=np.float32)
    n = len(pos)
    pos_b = pos.tobytes()
    bid_b = bid.tobytes()
    bin_chunk = _pad(pos_b, 4, b"\0") + _pad(bid_b, 4, b"\0")
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0, "_BATCHID": 1}, "mode": 4}]}],
        "buffers": [{"byteLength": len(bin_chunk)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": len(pos_b)},
            {"buffer": 0, "byteOffset": len(_pad(pos_b, 4, b"\0")), "byteLength": len(bid_b)},
        ],
        "accessors": [
            {
                "bufferView": 0, "byteOffset": 0, "componentType": 5126,
                "count": n, "type": "VEC3",
                "min": [float(v) for v in pos.min(axis=0)] if n else [0, 0, 0],
                "max": [float(v) for v in pos.max(axis=0)] if n else [0, 0, 0],
            },
            {
                "bufferView": 1, "byteOffset": 0, "componentType": 5126,
                "count": n, "type": "SCALAR",
            },
        ],
    }
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


def decode_glb(blob: bytes):
    """GLB -> (positions (N,3) float32, batch_ids (N,) float32)."""
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

    def _accessor(idx, ncomp):
        acc = gltf["accessors"][idx]
        bv = gltf["bufferViews"][acc["bufferView"]]
        start = bv.get("byteOffset", 0) + acc.get("byteOffset", 0)
        count = acc["count"]
        # vectorized: ONE frombuffer per accessor, not a per-element loop
        return np.frombuffer(binary, dtype=np.float32, count=count * ncomp, offset=start)

    pos = _accessor(prim["attributes"]["POSITION"], 3).reshape(-1, 3)
    bid = _accessor(prim["attributes"]["_BATCHID"], 1)
    return pos, bid


def encode_b3dm(
    positions: np.ndarray, batch_ids: np.ndarray, batch_table: dict
) -> bytes:
    """b3dm container (28-byte header + FeatureTable/BatchTable JSON + GLB),
    the tile-content format py3dtiles writes for the reference."""
    n_batch = int(batch_ids.max()) + 1 if len(batch_ids) else 0
    ft = _pad(json.dumps({"BATCH_LENGTH": n_batch}, separators=(",", ":")).encode())
    bt = _pad(json.dumps(batch_table, separators=(",", ":")).encode())
    glb = encode_glb(positions, batch_ids)
    total = 28 + len(ft) + len(bt) + len(glb)
    header = struct.pack("<4sIIIIII", b"b3dm", 1, total, len(ft), 0, len(bt), 0)
    return header + ft + bt + glb


def decode_b3dm(blob: bytes):
    """b3dm -> (positions, batch_ids, feature_table dict, batch_table dict)."""
    magic, version, _, ftj, ftb, btj, btb = struct.unpack_from("<4sIIIIII", blob, 0)
    if magic != b"b3dm" or version != 1:
        raise ValueError("not a b3dm v1 blob")
    off = 28
    ft = json.loads(blob[off : off + ftj].decode()) if ftj else {}
    off += ftj + ftb
    bt = json.loads(blob[off : off + btj].decode()) if btj else {}
    off += btj + btb
    pos, bid = decode_glb(blob[off:])
    return pos, bid, ft, bt
