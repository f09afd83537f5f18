"""Raster <-> vector oracle queries over the overlay-polygon dimension.

- rasterize_cells:  vector->raster explode (oracle: DuckDB lateral
  generate_series — an independent enumeration of the same cell algebra)
- raster_boundary:  generic 4-neighborhood erosion join (oracle: the
  CLOSED FORM for a rectangle, nx*ny - (nx-2)(ny-2) — fully independent
  of the join implementation)
- raster_runs:      gap-and-islands run-length encoding over a raster
  with deterministic holes punched in it (oracle: DuckDB window SQL)
"""
from __future__ import annotations

from pyspark.sql import functions as F

from .data.features import oracle_prelude, polygons_df
from .operators.raster import boundary_cells, cell_runs, rasterize_rects

CELL = 200.0
_X0, _Y0 = 1843000.0, 5173000.0

# The raster fixture = the shared overlay polygons PLUS three zero-coverage
# rectangles (round-4 ADVICE): thinner than a cell in x and/or y, so they
# cover NO cell center — the case where a naive sequence(lo, hi) with
# hi < lo silently emits a DESCENDING phantom range in Spark. 1001: 70x70
# mid-cell; 1002: thin column (x-empty, y-spanning); 1003: degenerate point.
_EXTRA_RECTS = [
    (1001, _X0 + 430.0, _Y0 + 430.0, _X0 + 500.0, _Y0 + 500.0),
    (1002, _X0 + 210.0, _Y0 + 150.0, _X0 + 260.0, _Y0 + 2350.0),
    (1003, _X0 + 900.0, _Y0 + 900.0, _X0 + 900.0, _Y0 + 900.0),
]


def raster_polys_df(spark):
    extra = spark.createDataFrame(
        _EXTRA_RECTS,
        "polygon_id int, xmin double, ymin double, xmax double, ymax double",
    )
    return polygons_df(spark).unionByName(extra)


_RASTER_POLYS_CTE = "raster_polys AS (SELECT * FROM polygons" + "".join(
    f" UNION ALL SELECT CAST({pid} AS INT), CAST({a} AS DOUBLE),"
    f" CAST({b} AS DOUBLE), CAST({c} AS DOUBLE), CAST({d} AS DOUBLE)"
    for pid, a, b, c, d in _EXTRA_RECTS
) + ")"

# DuckDB CTE: the same center-in-rect cell enumeration as a dense cross
# join filtered to each rectangle's bounds (DuckDB's generate_series cannot
# take lateral column parameters; grid64 covers the 0..63 cell range of the
# fixture extent) — an independent enumeration of the same cell algebra.
_CELLS_CTE = f"""
cells AS (
  SELECT polygon_id, tx.i AS gx, ty.i AS gy
  FROM raster_polys, grid64 tx, grid64 ty
  WHERE tx.i >= CAST(ceil((xmin - {_X0}) / {CELL} - 0.5) AS BIGINT)
    AND tx.i <  CAST(ceil((xmax - {_X0}) / {CELL} - 0.5) AS BIGINT)
    AND ty.i >= CAST(ceil((ymin - {_Y0}) / {CELL} - 0.5) AS BIGINT)
    AND ty.i <  CAST(ceil((ymax - {_Y0}) / {CELL} - 0.5) AS BIGINT)
)
""".strip()


def q_rasterize(spark, sf_dir):
    return rasterize_rects(raster_polys_df(spark), CELL)


ORACLE_RASTERIZE = oracle_prelude([_RASTER_POLYS_CTE, _CELLS_CTE]) + """
SELECT polygon_id, gx, gy FROM cells
"""


def q_boundary(spark, sf_dir):
    """Raster morphology pair in one query: 4-neighborhood EROSION
    (boundary_cells — oracle side is the rectangle CLOSED FORM
    nx*ny - (nx-2)(ny-2), so a wrong join cannot cancel out) joined with
    the gap-and-islands RUN-LENGTH encoding (cell_runs) over the same
    raster with deterministic holes punched where (gx+gy)%7==0 — the
    non-convex case a window-based RLE must split correctly."""
    cells = rasterize_rects(raster_polys_df(spark), CELL)
    ero = (
        boundary_cells(cells)
        .groupBy("polygon_id")
        .agg(
            F.count("*").cast("bigint").alias("n_cells"),
            F.sum(F.col("is_boundary").cast("bigint")).cast("bigint").alias("n_boundary"),
        )
    )
    holed = cells.where((F.col("gx") + F.col("gy")) % 7 != 0)
    rle = (
        cell_runs(holed)
        .groupBy("polygon_id")
        .agg(
            F.count("*").cast("bigint").alias("n_runs"),
            F.sum("run_len").cast("bigint").alias("sum_len"),
            F.min("gx0").cast("bigint").alias("min_gx0"),
        )
    )
    return ero.join(rle, "polygon_id")


ORACLE_BOUNDARY = oracle_prelude([_RASTER_POLYS_CTE, _CELLS_CTE]) + f"""
, ero AS (
  SELECT polygon_id,
         CAST(nx * ny AS BIGINT) AS n_cells,
         CAST(nx * ny - GREATEST(nx - 2, 0) * GREATEST(ny - 2, 0) AS BIGINT)
           AS n_boundary
  FROM (
    SELECT polygon_id,
           CAST(ceil((xmax - {_X0}) / {CELL} - 0.5)
              - ceil((xmin - {_X0}) / {CELL} - 0.5) AS BIGINT) AS nx,
           CAST(ceil((ymax - {_Y0}) / {CELL} - 0.5)
              - ceil((ymin - {_Y0}) / {CELL} - 0.5) AS BIGINT) AS ny
    FROM raster_polys
  )
  -- zero-coverage rects contribute no cells, hence no group on the Spark side
  WHERE nx > 0 AND ny > 0
), holed AS (SELECT * FROM cells WHERE (gx + gy) % 7 <> 0),
runs AS (
  SELECT polygon_id, gy,
         gx - ROW_NUMBER() OVER (PARTITION BY polygon_id, gy ORDER BY gx)
           AS run_key,
         gx
  FROM holed
),
rle AS (
  SELECT polygon_id, gy, run_key, MIN(gx) AS gx0, COUNT(*) AS run_len
  FROM runs GROUP BY 1, 2, 3
),
ragg AS (
  SELECT polygon_id,
         CAST(COUNT(*) AS BIGINT) AS n_runs,
         CAST(SUM(run_len) AS BIGINT) AS sum_len,
         CAST(MIN(gx0) AS BIGINT) AS min_gx0
  FROM rle GROUP BY 1
)
SELECT polygon_id, n_cells, n_boundary, n_runs, sum_len, min_gx0
FROM ero JOIN ragg USING (polygon_id)
"""


def register(QUERIES: dict) -> None:
    QUERIES["rasterize_cells"] = (q_rasterize, ORACLE_RASTERIZE)
    QUERIES["raster_boundary"] = (q_boundary, ORACLE_BOUNDARY)  # erosion + RLE
