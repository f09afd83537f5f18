"""Property-based S2 invariants (hypothesis) — pure numpy, no Spark."""
from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from py3dtilers_spark.functions import s2

lat = st.floats(min_value=-89.999, max_value=89.999, allow_nan=False)
lng = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)


@settings(max_examples=200, deadline=None)
@given(lat, lng)
def test_leaf_id_roundtrip_and_level(la, ln):
    cid = s2.cell_id_np(np.array([la]), np.array([ln]))
    assert int(s2.level_np(cid)[0]) == 30
    assert int(cid[0]) & 1 == 1
    f, i, j = s2.id_to_face_ij(cid)
    assert int(s2.face_ij_to_id(f, i, j)[0]) == int(cid[0])
    assert 0 <= int(f[0]) <= 5


@settings(max_examples=200, deadline=None)
@given(lat, lng, st.integers(min_value=0, max_value=29))
def test_parent_range_contains_leaf(la, ln, level):
    leaf = s2.cell_id_np(np.array([la]), np.array([ln]))
    par = s2.parent_np(leaf, level)
    assert int(s2.level_np(par)[0]) == level
    assert int(s2.range_min_np(par)[0]) <= int(leaf[0]) <= int(s2.range_max_np(par)[0])
    # parents are nested: coarser parent contains finer parent's range
    if level < 29:
        finer = s2.parent_np(leaf, level + 1)
        assert int(s2.range_min_np(par)[0]) <= int(s2.range_min_np(finer)[0])
        assert int(s2.range_max_np(finer)[0]) <= int(s2.range_max_np(par)[0])


@settings(max_examples=100, deadline=None)
@given(lat, lng)
def test_unit_sphere_projection(la, ln):
    x, y, z = s2.latlng_to_xyz(np.array([la]), np.array([ln]))
    assert abs(x[0] ** 2 + y[0] ** 2 + z[0] ** 2 - 1.0) < 1e-12
    face, u, v = s2.xyz_to_face_uv(x, y, z)
    assert abs(u[0]) <= 1.0 + 1e-9 and abs(v[0]) <= 1.0 + 1e-9
