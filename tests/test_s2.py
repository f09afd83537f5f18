"""S2 cell encoding: lookup-table fast path vs an independent per-level
scalar recursion, structural invariants, and the Spark column surface."""
from __future__ import annotations

import numpy as np
import pytest

from py3dtilers_spark.functions import s2


def _slow_cell_id(lat, lng):
    """Independent oracle: same public S2 definition, but the Hilbert
    position is accumulated 1 level (2 bits) at a time with the base
    4-entry tables — no shared code with the 4-bit lookup fast path."""
    x, y, z = s2.latlng_to_xyz(np.array([lat]), np.array([lng]))
    face, u, v = s2.xyz_to_face_uv(x, y, z)
    face = int(face[0])
    i = int(s2._st_to_ij(s2._uv_to_st(u))[0])
    j = int(s2._st_to_ij(s2._uv_to_st(v))[0])
    pos = 0
    orient = face & s2._SWAP
    ij_to_pos = np.zeros((4, 4), dtype=int)
    for o in range(4):
        for p in range(4):
            ij_to_pos[o, s2._POS_TO_IJ[o][p]] = p
    for level in range(s2.MAX_LEVEL):
        k = s2.MAX_LEVEL - 1 - level
        bi = (i >> k) & 1
        bj = (j >> k) & 1
        p = int(ij_to_pos[orient, (bi << 1) | bj])
        pos = (pos << 2) | p
        orient ^= int(s2._POS_TO_ORIENT[p])
    return ((face << 60) | pos) * 2 + 1


def test_fast_matches_independent_scalar():
    rng = np.random.default_rng(11)
    lats = rng.uniform(-89.9, 89.9, 64)
    lngs = rng.uniform(-180, 180, 64)
    fast = s2.cell_id_np(lats, lngs)
    for k in range(64):
        assert int(fast[k]) == _slow_cell_id(lats[k], lngs[k])


def test_face_cell_tokens():
    # The six level-0 (face) cells have the canonical public tokens
    # 1, 3, 5, 7, 9, b.
    centers = [(0, 0), (0, 90), (90, 0), (0, 180), (0, -90), (-90, 0)]
    ids = [s2.cell_id_np(np.array([la]), np.array([ln]), level=0)[0] for la, ln in centers]
    assert s2.token_np(np.array(ids)) == ["1", "3", "5", "7", "9", "b"]


def test_parent_contains_child():
    rng = np.random.default_rng(3)
    lats = rng.uniform(-85, 85, 200)
    lngs = rng.uniform(-180, 180, 200)
    leaf = s2.cell_id_np(lats, lngs)
    for level in (0, 5, 12, 20, 29):
        par = s2.parent_np(leaf, level)
        assert np.all(s2.level_np(par) == level)
        assert np.all(s2.range_min_np(par) <= leaf)
        assert np.all(leaf <= s2.range_max_np(par))
        # parent at level L computed from the leaf == parent of the
        # level-(L+1) parent: the hierarchy is consistent
        assert np.all(s2.parent_np(s2.parent_np(leaf, level + 1), level) == par)


def test_id_roundtrip_face_ij():
    rng = np.random.default_rng(5)
    lats = rng.uniform(-89, 89, 100)
    lngs = rng.uniform(-180, 180, 100)
    cid = s2.cell_id_np(lats, lngs)
    f, i, j = s2.id_to_face_ij(cid)
    assert np.all(s2.face_ij_to_id(f, i, j) == cid)
    assert np.all(s2.level_np(cid) == 30)


def test_decode_ij_matches_direct_projection():
    """Regression (round-4 ADVICE): id_to_face_ij must return the EXACT i,j
    the projection produced — not merely values that re-encode to the same
    id. The old full-8-bit top-chunk mask leaked face bits into the Hilbert
    lookup on faces 1-5 (decoded i up to ~2^32), invisible to the roundtrip
    test because encode's own top-chunk masking undid the corruption."""
    rng = np.random.default_rng(123)
    lats = rng.uniform(-89, 89, 2000)
    lngs = rng.uniform(-180, 180, 2000)
    x, y, z = s2.latlng_to_xyz(lats, lngs)
    face, u, v = s2.xyz_to_face_uv(x, y, z)
    i_direct = s2._st_to_ij(s2._uv_to_st(u))
    j_direct = s2._st_to_ij(s2._uv_to_st(v))
    cid = s2.face_ij_to_id(face, i_direct, j_direct)
    f2, i2, j2 = s2.id_to_face_ij(cid)
    assert sorted(set(face.tolist())) == [0, 1, 2, 3, 4, 5]  # all faces hit
    assert np.all(f2 == face)
    assert np.all(i2 < (1 << 30)) and np.all(j2 < (1 << 30))
    assert np.all(i2 == i_direct) and np.all(j2 == j_direct)


def test_nearby_points_share_coarse_parent():
    base = s2.cell_id_np(np.array([45.0]), np.array([7.0]), level=10)[0]
    jit = s2.cell_id_np(np.array([45.0001]), np.array([7.0001]), level=10)[0]
    assert base == jit
    far = s2.cell_id_np(np.array([-45.0]), np.array([100.0]), level=10)[0]
    assert base != far


def test_spark_column_surface(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(45.0, 7.0), (45.0001, 7.0001), (-45.0, 100.0)], "lat double, lng double"
    )
    out = df.select(
        s2.s2_cell_id(F.col("lat"), F.col("lng")).alias("leaf"),
    ).withColumn("p10", s2.s2_parent(F.col("leaf"), 10))
    rows = out.collect()
    leafs = s2.cell_id_np(
        np.array([45.0, 45.0001, -45.0]), np.array([7.0, 7.0001, 100.0])
    ).astype(np.int64)
    assert [r.leaf for r in rows] == list(leafs)
    assert rows[0].p10 == rows[1].p10 != rows[2].p10
    # signed bigint parent math == unsigned numpy parent math
    assert np.all(
        np.array([r.p10 for r in rows], dtype=np.int64).astype(np.uint64)
        == s2.parent_np(leafs.astype(np.uint64), 10)
    )


def test_rollup_oracle_sql_matches_numpy_kernel():
    """The generated DuckDB SQL (unrolled Hilbert lookup + HUGEINT parent
    math) must reproduce face_ij_to_id + parent_np exactly on raw integer
    (face, i, j) rows — no Spark involved."""
    import duckdb
    import numpy as np

    from py3dtilers_spark.functions.s2 import (
        face_ij_to_id, parent_np, s2_rollup_oracle_sql,
    )

    rng = np.random.default_rng(17)
    n = 200
    face = rng.integers(0, 6, n)
    i = rng.integers(0, 1 << 30, n)
    j = rng.integers(0, 1 << 30, n)
    w = rng.integers(0, 100, n)

    leaf = face_ij_to_id(face, i, j)
    c12 = parent_np(leaf, 12).astype(np.int64)
    c8 = parent_np(leaf, 8).astype(np.int64)
    want = {}
    for a, b, ww in zip(c8, c12, w):
        key = (int(a), int(b))
        nn, sw = want.get(key, (0, 0))
        want[key] = (nn + 1, sw + int(ww))

    con = duckdb.connect()
    con.execute("SET threads=1")
    con.register(
        "src_tbl",
        __import__("pandas").DataFrame(
            {"face": face.astype("int64"), "i": i.astype("int64"),
             "j": j.astype("int64"), "w": w.astype("int64")}
        ),
    )
    sql = s2_rollup_oracle_sql("SELECT face, i, j, w FROM src_tbl")
    got = {
        (int(r[0]), int(r[1])): (int(r[2]), int(r[3]))
        for r in con.execute(sql).fetchall()
    }
    assert got == want
