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

# DuckDB CTE: the same center-in-rect cell enumeration as a dense cross
# join filtered to each rectangle's bounds (DuckDB's generate_series cannot
# take lateral column parameters; grid64 covers the 0..63 cell range of the
# fixture extent) — an independent enumeration of the same cell algebra.
_CELLS_CTE = f"""
cells AS (
  SELECT polygon_id, tx.i AS gx, ty.i AS gy
  FROM polygons, grid64 tx, grid64 ty
  WHERE tx.i >= CAST(ceil((xmin - {_X0}) / {CELL} - 0.5) AS BIGINT)
    AND tx.i <  CAST(ceil((xmax - {_X0}) / {CELL} - 0.5) AS BIGINT)
    AND ty.i >= CAST(ceil((ymin - {_Y0}) / {CELL} - 0.5) AS BIGINT)
    AND ty.i <  CAST(ceil((ymax - {_Y0}) / {CELL} - 0.5) AS BIGINT)
)
""".strip()


def q_rasterize(spark, sf_dir):
    return rasterize_rects(polygons_df(spark), CELL)


ORACLE_RASTERIZE = oracle_prelude([_CELLS_CTE]) + """
SELECT polygon_id, gx, gy FROM cells
"""


def q_boundary(spark, sf_dir):
    """Generic raster erosion (neighbor-count join); the oracle is the
    rectangle closed form, so a wrong join would not cancel out."""
    cells = rasterize_rects(polygons_df(spark), CELL)
    return (
        boundary_cells(cells)
        .groupBy("polygon_id")
        .agg(
            F.count("*").cast("bigint").alias("n_cells"),
            F.sum(F.col("is_boundary").cast("bigint")).cast("bigint").alias("n_boundary"),
        )
    )


ORACLE_BOUNDARY = oracle_prelude() + f"""
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
  FROM polygons
)
"""


def q_runs(spark, sf_dir):
    """Raster->vector over a NON-convex shape: holes punched where
    (gx + gy) % 7 == 0 split rows into multiple runs."""
    cells = rasterize_rects(polygons_df(spark), CELL).where(
        (F.col("gx") + F.col("gy")) % 7 != 0
    )
    return (
        cell_runs(cells)
        .groupBy("polygon_id")
        .agg(
            F.count("*").cast("bigint").alias("n_runs"),
            F.sum("run_len").cast("bigint").alias("sum_len"),
            F.min("gx0").cast("bigint").alias("min_gx0"),
        )
    )


ORACLE_RUNS = oracle_prelude([_CELLS_CTE]) + """
, holed AS (SELECT * FROM cells WHERE (gx + gy) % 7 <> 0),
runs AS (
  SELECT polygon_id, gy,
         gx - ROW_NUMBER() OVER (PARTITION BY polygon_id, gy ORDER BY gx)
           AS run_key,
         gx
  FROM holed
),
rle AS (
  SELECT polygon_id, gy, run_key,
         MIN(gx) AS gx0, COUNT(*) AS run_len
  FROM runs GROUP BY 1, 2, 3
)
SELECT polygon_id,
       CAST(COUNT(*) AS BIGINT) AS n_runs,
       CAST(SUM(run_len) AS BIGINT) AS sum_len,
       CAST(MIN(gx0) AS BIGINT) AS min_gx0
FROM rle GROUP BY 1
"""


def register(QUERIES: dict) -> None:
    QUERIES["rasterize_cells"] = (q_rasterize, ORACLE_RASTERIZE)
    QUERIES["raster_boundary"] = (q_boundary, ORACLE_BOUNDARY)
    QUERIES["raster_runs"] = (q_runs, ORACLE_RUNS)
