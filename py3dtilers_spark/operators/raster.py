"""Raster <-> vector conversion operators (north-rule axis).

The reference never rasterizes (its overlay joins are polygon-polygon,
/root/reference/py3dtilers/Common/group.py:150-185); at 100 TB a raster
intermediate is how vector overlays scale — a polygon becomes a set of
grid-cell keys and every downstream overlay/zonal op becomes an equi-join
on the cell key instead of a geometry predicate.

Three operators, all pure Catalyst (no UDF anywhere):

- ``rasterize_rects``  (vector -> raster): explode each rectangle into the
  grid cells whose CENTER falls inside. `sequence()` + two explodes; the
  explode is map-side (no shuffle) and the output carries a canonical
  (gx, gy) key for cell-keyed joins.
- ``boundary_cells``   (raster morphology): 4-neighborhood erosion via a
  self equi-join on the shifted cell key — a cell with fewer than 4
  in-shape neighbors is boundary. Shuffles once on the cell key; at scale
  the join is co-partitioned with any other cell-keyed dataset.
- ``cell_runs``        (raster -> vector): gap-and-islands run-length
  encoding per (id, row) — `gx - row_number()` is constant within a
  maximal horizontal run. One window partitioned by (id, gy); the runs are
  the horizontal edges of a reconstructed polygon (rectangle decomposition).

Cell convention: gx = floor((x - x0)/cell), center at x0 + (gx+0.5)*cell.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.spatial import X0, Y0


def rasterize_rects(
    polys: DataFrame, cell_size: float, x0: float = X0, y0: float = Y0
) -> DataFrame:
    """(polygon_id, xmin, ymin, xmax, ymax) -> (polygon_id, gx, gy), one row
    per covered cell (center-in-rect rule, exclusive max edge)."""
    c = F.lit(cell_size)
    lo_gx = F.ceil((F.col("xmin") - F.lit(x0)) / c - F.lit(0.5))
    hi_gx = F.ceil((F.col("xmax") - F.lit(x0)) / c - F.lit(0.5)) - F.lit(1)
    lo_gy = F.ceil((F.col("ymin") - F.lit(y0)) / c - F.lit(0.5))
    hi_gy = F.ceil((F.col("ymax") - F.lit(y0)) / c - F.lit(0.5)) - F.lit(1)
    # a rect narrower/shorter than a cell can cover NO cell center, making
    # hi < lo — and Spark's sequence(start, stop) then defaults to step -1
    # and emits a DESCENDING (phantom) range instead of an empty one. Filter
    # zero-coverage spans before each explode.
    return (
        polys.select(
            "polygon_id",
            lo_gx.alias("lo_gx"),
            hi_gx.alias("hi_gx"),
            lo_gy.alias("lo_gy"),
            hi_gy.alias("hi_gy"),
        )
        .where((F.col("hi_gx") >= F.col("lo_gx")) & (F.col("hi_gy") >= F.col("lo_gy")))
        .select(
            "polygon_id",
            F.explode(F.sequence(F.col("lo_gx"), F.col("hi_gx"))).alias("gx"),
            "lo_gy",
            "hi_gy",
        )
        .select(
            "polygon_id",
            "gx",
            F.explode(F.sequence(F.col("lo_gy"), F.col("hi_gy"))).alias("gy"),
        )
    )


def boundary_cells(cells: DataFrame, id_col: str = "polygon_id") -> DataFrame:
    """Mark raster boundary cells: fewer than 4 of the 4-neighborhood
    present in the same shape. Returns cells + ``n_nbrs`` + ``is_boundary``.

    One self equi-join on (id, gx, gy) after a 4-way map-side explode of
    neighbor offsets — no geometry predicate, broadcast nothing, the join
    key is the cell key every other raster op already shuffles on."""
    nbrs = cells.select(
        F.col(id_col),
        F.explode(
            F.array(
                F.struct((F.col("gx") + 1).alias("gx"), F.col("gy").alias("gy")),
                F.struct((F.col("gx") - 1).alias("gx"), F.col("gy").alias("gy")),
                F.struct(F.col("gx").alias("gx"), (F.col("gy") + 1).alias("gy")),
                F.struct(F.col("gx").alias("gx"), (F.col("gy") - 1).alias("gy")),
            )
        ).alias("nb"),
    ).select(id_col, F.col("nb.gx").alias("gx"), F.col("nb.gy").alias("gy"))
    # count, for each real cell, how many neighbor-offset rows land on it
    nbr_counts = nbrs.groupBy(id_col, "gx", "gy").agg(F.count("*").alias("n_nbrs"))
    return (
        cells.join(nbr_counts, [id_col, "gx", "gy"], "left")
        .withColumn("n_nbrs", F.coalesce(F.col("n_nbrs"), F.lit(0)))
        .withColumn("is_boundary", F.col("n_nbrs") < 4)
    )


def cell_runs(cells: DataFrame, id_col: str = "polygon_id") -> DataFrame:
    """Raster -> vector: maximal horizontal runs per (id, gy) row.

    Returns (id, gy, gx0, run_len). `gx - row_number()` is constant inside
    a gap-free ascending run, so one window + one groupBy reconstructs the
    row decomposition of the shape (the horizontal slab representation a
    polygonizer stitches vertically)."""
    w = Window.partitionBy(id_col, "gy").orderBy("gx")
    runs = cells.withColumn("run_key", F.col("gx") - F.row_number().over(w))
    return (
        runs.groupBy(id_col, "gy", "run_key")
        .agg(
            F.min("gx").alias("gx0"),
            F.count("*").cast("bigint").alias("run_len"),
        )
        .drop("run_key")
    )
