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


def test_rasterize_zero_coverage_rects(spark):
    """Regression (round-4 ADVICE): a rect covering NO cell center must emit
    ZERO cells — Spark's sequence(start, stop) defaults to step -1 when
    stop < start, which produced phantom descending ranges (a 70x70 rect at
    cell=200 yielded 4 phantom cells)."""
    polys = spark.createDataFrame(
        [
            # the ADVICE repro: 70x70 rect between cell centers at cell=200
            (1, X0 + 430.0, Y0 + 430.0, X0 + 500.0, Y0 + 500.0),
            # x-empty but y-spanning (one empty axis is enough to kill it)
            (2, X0 + 210.0, Y0 + 150.0, X0 + 260.0, Y0 + 2350.0),
            # fully degenerate point rect
            (3, X0 + 900.0, Y0 + 900.0, X0 + 900.0, Y0 + 900.0),
            # control: a covering rect still rasterizes
            (4, X0 + 100.0, Y0 + 100.0, X0 + 700.0, Y0 + 300.0),
        ],
        "polygon_id int, xmin double, ymin double, xmax double, ymax double",
    )
    rows = rasterize_rects(polys, 200.0).collect()
    assert {r.polygon_id for r in rows} == {4}
    # centers x = 100, 300, 500 fall in [100, 700); y = 100 in [100, 300)
    assert sorted((r.gx, r.gy) for r in rows) == [(0, 0), (1, 0), (2, 0)]


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
