"""Geometry kernels G2/G3/G5/G7 + real b3dm/GLB round-trip (S5/K1/G11)."""
import numpy as np
import pandas as pd
import pytest

from py3dtilers_spark.operators.geometry import (
    buffer_polyline,
    ear_clip,
    prism_extrude,
    ring_doubled_area,
    tri_doubled_areas,
    triangle_normals,
)
from py3dtilers_spark.sources.b3dm_io import (
    decode_b3dm,
    decode_glb,
    encode_b3dm,
    encode_glb,
)


def test_earclip_concave_area_preserved():
    # non-convex U shape (8 vertices, CCW)
    ring = np.array(
        [[0, 0], [30, 0], [30, 20], [20, 20], [20, 5], [10, 5], [10, 20], [0, 20]],
        dtype=np.float64,
    )
    tris = ear_clip(ring)
    assert len(tris) == len(ring) - 2
    shoelace = ring_doubled_area(ring)
    assert tri_doubled_areas(ring, tris).sum() == shoelace


def test_prism_closed_surface_normals_cancel():
    ring = np.array([[0, 0], [20, 0], [20, 10], [5, 10], [5, 25], [0, 25]], float)
    tris = prism_extrude(ring, 2.0, 32.0)
    unit, dbl = triangle_normals(tris)
    # area-weighted normal sum of a CLOSED surface is zero
    assert np.allclose((unit * dbl[:, None]).sum(axis=0), 0.0, atol=1e-9)
    # outward orientation: top triangles face +z, bottom -z
    top = tris[:, :, 2].min(axis=1) == 32.0
    bot = tris[:, :, 2].max(axis=1) == 2.0
    assert np.all(unit[top][:, 2] > 0.99)
    assert np.all(unit[bot][:, 2] < -0.99)


def test_buffer_polyline_miter():
    # right-angle staircase, width 4: miter corners at offset intersections
    ring = buffer_polyline(np.array([[0, 0], [10, 0], [10, 10]], float), 4.0)
    assert len(ring) == 6
    # hand-computed union of the two mitered strips:
    # x in [0,12] x y in [-2,2] (48) + x in [8,12] x y in [2,10] (32)
    assert ring_doubled_area(ring) / 2 == 80
    # collinear mid-point: no miter blow-up, offsets pass straight through
    ring2 = buffer_polyline(np.array([[0, 0], [5, 0], [12, 0]], float), 2.0)
    assert ring_doubled_area(ring2) / 2 == 12 * 2


def test_glb_roundtrip():
    rng = np.random.default_rng(7)
    pos = rng.normal(size=(12, 3)).astype(np.float32)
    bid = np.repeat(np.arange(4, dtype=np.float32), 3)
    blob = encode_glb(pos, bid)
    assert blob[:4] == b"glTF"
    pos2, bid2 = decode_glb(blob)
    assert np.array_equal(pos, pos2) and np.array_equal(bid, bid2)


def test_b3dm_roundtrip_spark(spark):
    """Per-tile b3dm encode in an Arrow batch -> read back -> exact feature
    equality (the reference's write->read cycle, tests/test_tilesetReader.py)."""
    ring = np.array([[0, 0], [20, 0], [20, 10], [5, 10], [5, 25], [0, 25]], float)
    tiles = []
    for t in range(4):
        tris = prism_extrude(ring + t * 40.0, 0.0, 10.0 + t)
        pos = tris.reshape(-1, 3).astype(np.float32)
        bid = np.zeros(len(pos), dtype=np.float32)
        tiles.append(("tile_%d" % t, pos, bid))

    pdf = pd.DataFrame(
        {
            "tile_id": [t[0] for t in tiles],
            "b3dm": [
                encode_b3dm(p, b, {"ids": [tid]}) for tid, p, b in tiles
            ],
        }
    )
    df = spark.createDataFrame(pdf)

    def verify(batches):
        for b in batches:
            ok = []
            for tid, blob in zip(b["tile_id"], b["b3dm"]):
                pos, bid, ft, bt = decode_b3dm(bytes(blob))
                ok.append(
                    ft["BATCH_LENGTH"] == 1
                    and bt["ids"] == [tid]
                    and len(pos) == 60  # 20 triangles x 3 vertices
                )
            yield pd.DataFrame({"tile_id": b["tile_id"], "ok": ok})

    out = df.mapInPandas(verify, "tile_id string, ok boolean").toPandas()
    assert out["ok"].all() and len(out) == 4
    # byte-exact vertex recovery
    pos2, bid2, _, _ = decode_b3dm(bytes(pdf["b3dm"][2]))
    assert np.array_equal(pos2, tiles[2][1])


@pytest.mark.parametrize("n", [3, 4, 7])
def test_earclip_regular_polygons(n):
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    ring = np.column_stack([np.cos(ang), np.sin(ang)])
    tris = ear_clip(ring)
    assert len(tris) == n - 2
    assert np.isclose(tri_doubled_areas(ring, tris).sum(), ring_doubled_area(ring))


def test_earclip_with_holes_area():
    """G1: square with two square holes — triangulated area = outer - holes."""
    from py3dtilers_spark.operators.geometry import ear_clip_with_holes

    outer = np.array([[0, 0], [40, 0], [40, 40], [0, 40]], float)
    h1 = np.array([[10, 10], [18, 10], [18, 18], [10, 18]], float)
    h2c = np.array([[25, 22], [33, 22], [33, 30], [25, 30]], float)
    tris = ear_clip_with_holes(outer, [h1, h2c])
    # area via cross products of the emitted coordinate triangles
    a = tris[:, 0]; b = tris[:, 1]; c = tris[:, 2]
    area2 = np.abs(
        (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
        - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0])
    ).sum()
    assert area2 / 2 == 40 * 40 - 8 * 8 - 8 * 8
    # each bridge adds 2 duplicate vertices: n = 4 + (4+2) + (4+2) = 16 -> 14 tris
    assert len(tris) == 14


def test_strip_triangulation_indices():
    """G6: the reference's custom strip triangulation (geojson.py:48-63)
    over a buffered-line ring — full coverage, no overlaps (area check)."""
    from py3dtilers_spark.operators.geometry import strip_triangles

    line = np.array([[0, 0], [10, 0], [10, 10]], float)
    ring = buffer_polyline(line, 4.0)
    idx = strip_triangles(len(ring))
    assert len(idx) == 2 * (len(ring) // 2 - 1)
    tris = ring[idx]
    a = tris[:, 0]; b = tris[:, 1]; c = tris[:, 2]
    area2 = np.abs(
        (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
        - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0])
    ).sum()
    assert area2 / 2 == ring_doubled_area(ring) / 2


def test_convex_hull_footprint():
    """G4 (alpha=0 path): the reference's alphashape(points, 0.) footprint
    (polygon_extrusion.py:55) == convex hull."""
    from py3dtilers_spark.operators.geometry import convex_hull

    rng = np.random.default_rng(3)
    inner = rng.uniform(1, 9, size=(200, 2))
    corners = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    hull = convex_hull(np.vstack([inner, corners]))
    assert sorted(map(tuple, hull)) == sorted(map(tuple, corners))
    assert ring_doubled_area(hull) / 2 == 100.0


def test_delaunay_and_alpha_shape():
    """G4 (alpha>0): Delaunay triangle count 2n-2-h; alpha boundary of a
    two-cluster set splits into two loops while alpha=0 gives one hull."""
    from py3dtilers_spark.operators.geometry import (
        alpha_shape_edges,
        convex_hull,
        delaunay,
    )

    rng = np.random.default_rng(5)
    c1 = rng.uniform(0, 10, size=(40, 2))
    c2 = rng.uniform(100, 110, size=(40, 2)) 
    pts = np.vstack([c1, c2])
    tris = delaunay(pts)
    h = len(convex_hull(pts))
    assert len(tris) == 2 * len(pts) - 2 - h  # Euler: triangulation identity
    # alpha=0: one connected hull boundary, edge count == hull size
    e0 = alpha_shape_edges(pts, 0.0)
    assert len(e0) == h
    # alpha tuned to cluster scale: long cross-cluster triangles dropped ->
    # more boundary edges than the single hull, none longer than ~cluster size
    ea = alpha_shape_edges(pts, 1.0 / 12.0)
    assert len(ea) > h
    lens = np.hypot(*(pts[ea[:, 0]] - pts[ea[:, 1]]).T)
    assert lens.max() < 25.0


def test_earclip_degenerate_returns_empty():
    """A self-intersecting / zero-area ring must yield an EMPTY triangulation
    (never a truncated fan that would corrupt n_tri/area invariants)."""
    import numpy as np

    from py3dtilers_spark.operators.geometry import ear_clip

    # collinear ring: no convex ear exists anywhere
    collinear = np.array([[0, 0], [1, 0], [2, 0], [3, 0], [4, 0]], dtype=float)
    assert len(ear_clip(collinear)) == 0
    # bowtie (self-intersecting): ear scan stalls with 4 vertices left
    bowtie = np.array([[0, 0], [2, 2], [2, 0], [0, 2]], dtype=float)
    tris = ear_clip(bowtie)
    assert len(tris) in (0, 2)  # clipped clean or rejected — never 1 bogus tri
    # a healthy triangle still passes through untouched
    tri = np.array([[0, 0], [4, 0], [0, 4]], dtype=float)
    assert len(ear_clip(tri)) == 1


def test_revolve_ring_full_and_partial():
    """G-kernel revolve_ring: exact discretized volume, watertight closed
    mesh, winding/orientation normalization (see test_ifc.py for the
    IfcRevolvedAreaSolid end-to-end)."""
    from collections import Counter

    from py3dtilers_spark.operators.geometry import mesh_volume6, revolve_ring

    ring = np.array([[1.0, 0.0], [2.0, 0.0], [2.0, 1.0], [1.0, 1.0]])
    axis_pt, axis_dir = np.array([0.0, 0.0]), np.array([0.0, 1.0])

    def edge_counts(mesh):
        c = Counter()
        for t in mesh:
            for i in range(3):
                e = frozenset(
                    (tuple(np.round(t[i], 9)), tuple(np.round(t[(i + 1) % 3], 9)))
                )
                c[e] += 1
        return c

    for angle, s in [(2 * np.pi, 64), (np.pi / 2, 16)]:
        m = revolve_ring(ring, axis_pt, axis_dir, angle, segments=s)
        assert all(v == 2 for v in edge_counts(m).values())  # watertight
        vol = mesh_volume6(m) / 6.0
        exact = s * 0.5 * np.sin(angle / s) * (4.0 - 1.0) * 1.0
        assert np.isclose(vol, exact, rtol=1e-9)
        # CW input ring must produce the identical (outward) solid
        m2 = revolve_ring(ring[::-1], axis_pt, axis_dir, angle, segments=s)
        assert np.isclose(mesh_volume6(m2), mesh_volume6(m), rtol=1e-12)


def test_revolve_ring_rejects_axis_crossing_and_degenerate():
    from py3dtilers_spark.operators.geometry import revolve_ring

    crossing = np.array([[-1.0, 0.0], [2.0, 0.0], [2.0, 1.0], [-1.0, 1.0]])
    with pytest.raises(ValueError):
        revolve_ring(crossing, np.array([0.0, 0.0]), np.array([0.0, 1.0]), np.pi)
    with pytest.raises(ValueError):
        revolve_ring(crossing[:2], np.array([0.0, 0.0]), np.array([0.0, 1.0]), np.pi)
    with pytest.raises(ValueError):
        revolve_ring(
            np.array([[1.0, 0.0], [2.0, 0.0], [2.0, 1.0]]),
            np.array([0.0, 0.0]),
            np.array([0.0, 0.0]),  # zero axis direction
            np.pi,
        )


def test_revolve_ring_on_axis_points_filtered():
    """A profile touching the axis (solid of revolution, e.g. a cone
    profile) keeps a watertight mesh with the r=0 degenerate side faces
    removed."""
    from collections import Counter

    from py3dtilers_spark.operators.geometry import mesh_volume6, revolve_ring

    # right triangle (0,0)(1,0)(0,1) about the y axis -> a cone, apex up
    ring = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    m = revolve_ring(ring, np.array([0.0, 0.0]), np.array([0.0, 1.0]),
                     2 * np.pi, segments=32)
    vol = mesh_volume6(m) / 6.0
    # discretized cone over an S-gon base: V = (1/3) * base_area * h
    base = 32 * 0.5 * np.sin(2 * np.pi / 32)
    assert np.isclose(vol, base / 3.0, rtol=1e-9)


def test_sweep_disk_straight_tube():
    """Straight swept-disk solid: closed, outward-oriented, with the exact
    discretized-polygon volume A_Ngon(r) * length."""
    import numpy as np

    from py3dtilers_spark.operators.geometry import (
        mesh_volume6, sweep_disk, triangle_normals,
    )

    S, r, L = 16, 0.5, 7.0
    pts = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, L]])
    tube = sweep_disk(pts, r, segments=S)
    a_poly = (S / 2.0) * r * r * np.sin(2.0 * np.pi / S)
    assert mesh_volume6(tube) == pytest.approx(6.0 * a_poly * L, rel=1e-9)
    # surface: walls (N-gon perimeter x L) + two caps
    per = 2.0 * S * r * np.sin(np.pi / S)
    _, dbl = triangle_normals(tube)
    assert dbl.sum() / 2.0 == pytest.approx(per * L + 2.0 * a_poly, rel=1e-9)


def test_sweep_disk_hollow_tube():
    import numpy as np

    from py3dtilers_spark.operators.geometry import mesh_volume6, sweep_disk

    S, ro, ri, L = 16, 0.5, 0.3, 4.0
    pts = np.array([[1.0, 2.0, 0.0], [1.0, 2.0, L]])
    tube = sweep_disk(pts, ro, segments=S, inner_radius=ri)
    a = (S / 2.0) * np.sin(2.0 * np.pi / S)
    assert mesh_volume6(tube) == pytest.approx(
        6.0 * (a * ro * ro - a * ri * ri) * L, rel=1e-9
    )


def test_sweep_disk_bend_and_transport():
    """L-bend pipe: watertight (volume ~ area x path length within miter
    error) and frames parallel-transported — no flipped/self-intersecting
    rings, so the signed volume stays positive and near the estimate."""
    import numpy as np

    from py3dtilers_spark.operators.geometry import mesh_volume6, sweep_disk

    S, r = 16, 0.2
    pts = np.array([[0.0, 0.0, 0.0], [3.0, 0.0, 0.0], [3.0, 2.0, 0.0],
                    [3.0, 2.0, 1.5]])
    tube = sweep_disk(pts, r, segments=S)
    a_poly = (S / 2.0) * r * r * np.sin(2.0 * np.pi / S)
    path_len = 3.0 + 2.0 + 1.5
    v = mesh_volume6(tube) / 6.0
    # true-miter ellipse rings make the prismatic volume identity EXACT
    assert v == pytest.approx(a_poly * path_len, rel=1e-9)
    # degenerate directrix rows (duplicate points) are dropped, not fatal
    pts_dup = np.array([[0, 0, 0], [0, 0, 0], [0, 0, 2.0]], dtype=float)
    v2 = mesh_volume6(sweep_disk(pts_dup, r, segments=S)) / 6.0
    assert v2 == pytest.approx(a_poly * 2.0, rel=1e-9)
