"""Raster operator unit checks on a hand-computed fixture (the oracle
queries cover the overlay-polygon fixtures; this pins the kernels on a
shape small enough to verify by hand)."""
from __future__ import annotations

from py3dtilers_spark.functions.spatial import X0, Y0
from py3dtilers_spark.operators.raster import boundary_cells, cell_runs, rasterize_rects


def test_rasterize_hand_case(spark):
    # rect spanning exactly cells gx 1..3, gy 2..2 at cell=100:
    # centers at X0+150, 250, 350 are in [X0+100, X0+400)
    polys = spark.createDataFrame(
        [(1, X0 + 100.0, Y0 + 200.0, X0 + 400.0, Y0 + 300.0)],
        "polygon_id int, xmin double, ymin double, xmax double, ymax double",
    )
    got = sorted(
        (r.gx, r.gy) for r in rasterize_rects(polys, 100.0).collect()
    )
    assert got == [(1, 2), (2, 2), (3, 2)]


def test_boundary_and_runs_hand_case(spark):
    # plus-shape: center cell has 4 neighbors (interior), arms are boundary
    cells = spark.createDataFrame(
        [(1, 1, 0), (1, 0, 1), (1, 1, 1), (1, 2, 1), (1, 1, 2)],
        "polygon_id int, gx bigint, gy bigint",
    )
    b = {(r.gx, r.gy): (r.n_nbrs, r.is_boundary) for r in boundary_cells(cells).collect()}
    assert b[(1, 1)] == (4, False)
    for arm in [(1, 0), (0, 1), (2, 1), (1, 2)]:
        assert b[arm][1] is True

    runs = sorted(
        (r.gy, r.gx0, r.run_len) for r in cell_runs(cells).collect()
    )
    # row 0: [1], row 1: [0..2], row 2: [1]
    assert runs == [(0, 1, 1), (1, 0, 3), (2, 1, 1)]
