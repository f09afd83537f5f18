"""S2 hierarchical cell encoding, from scratch, fully vectorized.

The north rule asks for "batched H3/S2 cell encoding of feature centroids
via pandas/Arrow UDFs". The container has no `s2geometry`/`h3` lib, so this
module re-implements the *public* S2 cell-id scheme (as described in the
published S2 geometry documentation: cube-face projection + quadratic
s/t transform + Hilbert curve position, 64-bit ids with a trailing set bit
marking the level) directly over numpy arrays, so a whole Arrow batch of
(lat, lng) pairs is encoded with no per-row Python.

Layout of a level-30 cell id (the canonical S2 layout):

    [3 bits face][2*30 bits Hilbert curve position][1]

The id of a cell at level L < 30 replaces the lowest 2*(30-L)+1 bits with
a single set bit ("lsb"), so parent(id, L) is two bitwise ops and range
containment is `parent - lsb < child < parent + lsb` — which is what makes
bottom-up tile roll-ups and cell-range joins pure integer predicates that
stay inside whole-stage codegen once the key column exists.

No counterpart in the reference (its spatial key is a flat 1000 m cube,
/root/reference/py3dtilers/Common/group.py:62-63); this is the scale path
for spherical data the flat grid cannot index.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

MAX_LEVEL = 30
_LOOKUP_BITS = 4
_SWAP = 1
_INVERT = 2

# Hilbert sub-cell traversal order per orientation, and the orientation
# delta each sub-cell applies — the two base tables of the S2 curve.
_POS_TO_IJ = np.array(
    [[0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1], [3, 1, 0, 2]], dtype=np.uint32
)
_POS_TO_ORIENT = np.array([_SWAP, 0, 0, _SWAP | _INVERT], dtype=np.uint32)


def _build_lookups():
    lookup_pos = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.uint32)
    lookup_ij = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.uint32)

    def rec(level, i, j, orig, pos, orient):
        if level == _LOOKUP_BITS:
            ij = (i << _LOOKUP_BITS) + j
            lookup_pos[(ij << 2) + orig] = (pos << 2) + orient
            lookup_ij[(pos << 2) + orig] = (ij << 2) + orient
            return
        r = _POS_TO_IJ[orient]
        for idx in range(4):
            ij = int(r[idx])
            rec(
                level + 1,
                (i << 1) + (ij >> 1),
                (j << 1) + (ij & 1),
                orig,
                (pos << 2) + idx,
                orient ^ int(_POS_TO_ORIENT[idx]),
            )

    for o in range(4):
        rec(0, 0, 0, o, 0, o)
    return lookup_pos, lookup_ij


_LOOKUP_POS, _LOOKUP_IJ = _build_lookups()


def latlng_to_xyz(lat_deg: np.ndarray, lng_deg: np.ndarray):
    lat = np.radians(lat_deg)
    lng = np.radians(lng_deg)
    cl = np.cos(lat)
    return cl * np.cos(lng), cl * np.sin(lng), np.sin(lat)


def xyz_to_face_uv(x: np.ndarray, y: np.ndarray, z: np.ndarray):
    """Largest-|component| cube face (0..5) + the two face coordinates."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    major = np.choose(face, [x, y, z])
    face = np.where(major < 0, face + 3, face).astype(np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.choose(
            face, [y / x, -x / y, -x / z, z / x, z / y, -y / z]
        )
        v = np.choose(
            face, [z / x, z / y, -y / z, y / x, -x / y, -x / z]
        )
    return face, u, v


def _uv_to_st(u: np.ndarray) -> np.ndarray:
    """Quadratic projection: equalizes cell area across a face."""
    return np.where(
        u >= 0,
        0.5 * np.sqrt(1.0 + 3.0 * np.abs(u)),
        1.0 - 0.5 * np.sqrt(1.0 + 3.0 * np.abs(u)),
    )


def _st_to_ij(s: np.ndarray) -> np.ndarray:
    return np.clip(
        np.floor(s * (1 << MAX_LEVEL)), 0, (1 << MAX_LEVEL) - 1
    ).astype(np.uint64)


def face_ij_to_id(face: np.ndarray, i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """Vectorized face+(i,j) -> level-30 cell id via the Hilbert lookup,
    4 bits of i and j per round (8 rounds), whole array at once."""
    face = face.astype(np.uint64)
    i = i.astype(np.uint64)
    j = j.astype(np.uint64)
    n = face << np.uint64(60)
    bits = (face & np.uint64(_SWAP)).astype(np.uint64)
    mask = np.uint64((1 << _LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        kk = np.uint64(k * _LOOKUP_BITS)
        bits += ((i >> kk) & mask) << np.uint64(_LOOKUP_BITS + 2)
        bits += ((j >> kk) & mask) << np.uint64(2)
        bits = _LOOKUP_POS[bits.astype(np.int64)].astype(np.uint64)
        n |= (bits >> np.uint64(2)) << np.uint64(k * 2 * _LOOKUP_BITS)
        bits &= np.uint64(_SWAP | _INVERT)
    return n * np.uint64(2) + np.uint64(1)


def id_to_face_ij(cid: np.ndarray):
    """Inverse of face_ij_to_id for level-30 ids (used by tests/decoding)."""
    cid = cid.astype(np.uint64)
    face = (cid >> np.uint64(61)).astype(np.uint64)
    bits = (face & np.uint64(_SWAP)).astype(np.uint64)
    i = np.zeros_like(cid)
    j = np.zeros_like(cid)
    nbits_mask = np.uint64((1 << (2 * _LOOKUP_BITS)) - 1)
    # the TOP chunk (k=7) holds only 2*(MAX_LEVEL - 7*_LOOKUP_BITS) = 4
    # position bits — bits 61-63 above it are the FACE, and masking a full
    # 8-bit chunk there would leak face bits into the Hilbert lookup index
    # (wrong i/j on faces 1-5). Matches the canonical S2 decode's per-round
    # nbits = kMaxLevel - 7*kLookupBits on the first iteration.
    top_mask = np.uint64((1 << (2 * (MAX_LEVEL - 7 * _LOOKUP_BITS))) - 1)
    mask = np.uint64((1 << _LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        # level-30 position occupies bits 1..60; chunk k holds curve bits
        # [k*8, k*8+8) of that position
        pos_chunk = (cid >> np.uint64(k * 2 * _LOOKUP_BITS + 1)) & (
            top_mask if k == 7 else nbits_mask
        )
        bits += pos_chunk << np.uint64(2)
        bits = _LOOKUP_IJ[bits.astype(np.int64)].astype(np.uint64)
        i |= ((bits >> np.uint64(_LOOKUP_BITS + 2)) & mask) << np.uint64(
            k * _LOOKUP_BITS
        )
        j |= ((bits >> np.uint64(2)) & mask) << np.uint64(k * _LOOKUP_BITS)
        bits &= np.uint64(_SWAP | _INVERT)
    return face, i, j


def cell_id_np(lat_deg: np.ndarray, lng_deg: np.ndarray, level: int = MAX_LEVEL) -> np.ndarray:
    """Batch (lat, lng) degrees -> S2 cell id at `level` (numpy kernel)."""
    x, y, z = latlng_to_xyz(np.asarray(lat_deg, float), np.asarray(lng_deg, float))
    face, u, v = xyz_to_face_uv(x, y, z)
    i = _st_to_ij(_uv_to_st(u))
    j = _st_to_ij(_uv_to_st(v))
    cid = face_ij_to_id(face, i, j)
    if level < MAX_LEVEL:
        cid = parent_np(cid, level)
    return cid


def parent_np(cid: np.ndarray, level: int) -> np.ndarray:
    """Ancestor cell at `level`: keep the high bits, set the level's lsb."""
    cid = np.asarray(cid).astype(np.uint64)
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return (cid & ~(lsb - np.uint64(1))) | lsb


def level_np(cid: np.ndarray) -> np.ndarray:
    """Level from the position of the lowest set bit."""
    cid = np.asarray(cid).astype(np.uint64)
    lsb = cid & (~cid + np.uint64(1))
    # log2(lsb) is exact for powers of two up to 2^60
    return (MAX_LEVEL - (np.log2(lsb.astype(np.float64)) / 2.0)).astype(np.int64)


def range_min_np(cid: np.ndarray) -> np.ndarray:
    cid = np.asarray(cid).astype(np.uint64)
    lsb = cid & (~cid + np.uint64(1))
    return cid - lsb + np.uint64(1)


def range_max_np(cid: np.ndarray) -> np.ndarray:
    cid = np.asarray(cid).astype(np.uint64)
    lsb = cid & (~cid + np.uint64(1))
    return cid + lsb - np.uint64(1)


def token_np(cid: np.ndarray) -> list:
    """Canonical hex token: 16 hex digits with trailing zeros stripped."""
    out = []
    for c in np.asarray(cid).astype(np.uint64):
        out.append(format(int(c), "016x").rstrip("0") or "X")
    return out


# --- Spark surface -----------------------------------------------------------


def s2_cell_id(lat: Column, lng: Column, level: int = MAX_LEVEL) -> Column:
    """Arrow-batched S2 cell id column (stored as signed bigint; ids with
    face >= 4 wrap negative — orderings that matter use the unsigned view)."""

    @F.pandas_udf(LongType())
    def _udf(la: pd.Series, ln: pd.Series) -> pd.Series:
        cid = cell_id_np(la.to_numpy(float), ln.to_numpy(float), level)
        return pd.Series(cid.astype(np.int64))

    return _udf(lat, lng)


def s2_cell_id_ij(face: Column, i: Column, j: Column) -> Column:
    """Arrow-batched leaf id from integer (face, i, j) — the pure-integer
    Hilbert half of the encode, split out so the DRIVER ORACLE can check it
    byte-exactly: the spherical lat/lng projection upstream runs through
    cos/sin/sqrt whose last-ulp rounding differs between numpy's SIMD
    kernels and DuckDB's libm, which would flip ~1e-7 of floor(s*2^30)
    boundaries — so the cross-engine query derives (i, j) from exactly
    rounded linear float ops instead and the spherical kernel stays pinned
    by tests/test_s2.py's independent scalar oracle."""

    @F.pandas_udf(LongType())
    def _udf(f: pd.Series, ii: pd.Series, jj: pd.Series) -> pd.Series:
        cid = face_ij_to_id(
            f.to_numpy(np.int64), ii.to_numpy(np.int64), jj.to_numpy(np.int64)
        )
        return pd.Series(cid.astype(np.int64))

    return _udf(face, i, j)


def s2_rollup_oracle_sql(src_sql: str) -> str:
    """DuckDB SQL computing the IDENTICAL leaf encode + level-12/8 parent
    roll-up over a source subquery yielding (face, i, j, w): the 8-round
    Hilbert lookup unrolled into chained CTEs with the 1024-entry
    _LOOKUP_POS table embedded as a list literal (the IVF
    embed-the-trained-constants pattern). All arithmetic is integer
    (HUGEINT where the unsigned 64-bit id overflows BIGINT); the final ids
    wrap to signed to match Spark's bigint view."""
    lut = ", ".join(str(int(v)) for v in _LOOKUP_POS)
    parts = [
        f"WITH src AS ({src_sql})",
        f"lut AS (SELECT [{lut}] AS l)",
        f"r8 AS (SELECT face, i, j, w, CAST(face AS HUGEINT) * {1 << 60} AS n,"
        " face % 2 AS bits FROM src)",
    ]
    for k in range(7, -1, -1):
        p4 = 1 << (4 * k)
        p8 = 1 << (8 * k)
        parts.append(
            f"a{k} AS (SELECT face, i, j, w, n, l[CAST(bits"
            f" + ((i // {p4}) % 16) * 64 + ((j // {p4}) % 16) * 4"
            f" AS BIGINT) + 1] AS lv FROM r{k + 1}, lut)"
        )
        parts.append(
            f"r{k} AS (SELECT face, i, j, w,"
            f" n + CAST(lv // 4 AS HUGEINT) * {p8} AS n,"
            f" lv % 4 AS bits FROM a{k})"
        )
    lsb12 = 1 << (2 * (MAX_LEVEL - 12))
    lsb8 = 1 << (2 * (MAX_LEVEL - 8))
    wrap = (
        "CAST(CASE WHEN {u} >= {half} THEN {u} - {full} ELSE {u} END AS BIGINT)"
    )
    p12 = f"((uid // {lsb12}) - ((uid // {lsb12}) % 2) + 1) * {lsb12}"
    p8_ = f"((uid // {lsb8}) - ((uid // {lsb8}) % 2) + 1) * {lsb8}"
    parts.append("fin AS (SELECT w, n * 2 + 1 AS uid FROM r0)")
    parts.append(f"cells AS (SELECT w, {p12} AS p12u, {p8_} AS p8u FROM fin)")
    body = ",\n".join(parts)
    c8 = wrap.format(u="p8u", half=1 << 63, full=1 << 64)
    c12 = wrap.format(u="p12u", half=1 << 63, full=1 << 64)
    return (
        body
        + f"\nSELECT {c8} AS cell8, {c12} AS cell12,"
        " count(*) AS n, CAST(sum(w) AS BIGINT) AS sum_w"
        " FROM cells GROUP BY 1, 2"
    )


def s2_parent(cid: Column, level: int) -> Column:
    """Pure column math (no UDF): parent id at `level` of a finer id."""
    lsb = 1 << (2 * (MAX_LEVEL - level))
    # (cid & ~(lsb-1)) | lsb in signed-64 arithmetic is bit-identical to the
    # unsigned version: & and | are bitwise on the two's-complement pattern
    return cid.bitwiseAND(F.lit(~(lsb - 1))).bitwiseOR(F.lit(lsb)).cast(LongType())
