"""GeoJSON FeatureCollection source (reference S1,
GeojsonTiler.retrieve_geojsons, GeojsonTiler/GeojsonTiler.py:102-126 +
property parsing geojson.py:37-47, 89-126).

spark.read.json handles the files (multiLine for pretty-printed
FeatureCollections); features explode into one row each; centroid = mean of
the exterior-ring vertices (the reference derives feature centroids from
geometry, feature.py:101-111); properties surface as typed columns with the
reference's defaults (HAUTEUR <= 0 -> 10, geojson.py:27,104-115) and the
PREC_ALTI >= 9999 filter (geojson.py:98-102) applied on request."""
from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


from pyspark.sql.types import ArrayType, DoubleType  # noqa: E402


# explicit DataType (not a DDL string): a DDL returnType would be parsed at
# import time and require an active SparkSession
@F.pandas_udf(ArrayType(ArrayType(DoubleType())))
def _buffer_lines(lines: pd.Series, widths: pd.Series) -> pd.Series:
    """Line -> buffered exterior ring (the reference's LineBuffer step,
    lineBuffer.py:47-70, via the oracle-green G5 kernel). Arrow-batched;
    polygon rows arrive with a null line and pass through as None."""
    import numpy as np

    from ..operators.geometry import buffer_polyline

    out = []
    for line, w in zip(lines, widths):
        if line is None or len(line) < 2:
            out.append(None)
            continue
        pts = np.asarray([p[:2] for p in line], dtype=np.float64)
        ring = buffer_polyline(pts, float(w))
        out.append([[float(x), float(y)] for x, y in ring])
    return pd.Series(out)

GEOJSON_SCHEMA = """
  type STRING,
  features ARRAY<STRUCT<
    type: STRING,
    properties: STRUCT<
      ID: STRING, HAUTEUR: DOUBLE, PREC_ALTI: DOUBLE, NATURE: STRING,
      Z_MIN: DOUBLE, WIDTH: DOUBLE
    >,
    geometry: STRUCT<type: STRING, coordinates: STRING>
  >>
"""
# coordinates nesting differs per geometry type (Polygon 3 levels,
# MultiPolygon 4), so the schema captures the raw JSON subtree as STRING
# and from_json re-parses it per type below.


def read_geojson(
    spark: SparkSession, path: str, apply_prec_filter: bool = True
) -> DataFrame:
    raw = spark.read.schema(GEOJSON_SCHEMA).option("multiLine", "true").json(path)
    feats = raw.select(F.explode("features").alias("f")).select(
        F.col("f.properties.ID").alias("feature_id"),
        F.expr(
            "CASE WHEN f.properties.HAUTEUR IS NULL OR f.properties.HAUTEUR <= 0"
            " THEN 10.0 ELSE f.properties.HAUTEUR END"
        ).alias("height"),
        F.col("f.properties.PREC_ALTI").alias("prec_alti"),
        F.col("f.properties.NATURE").alias("nature"),
        F.coalesce(F.col("f.properties.Z_MIN"), F.lit(0.0)).alias("z_min"),
        F.col("f.geometry.type").alias("geom_type"),
        # exterior ring: Polygon -> coordinates[0]; MultiPolygon -> the
        # FIRST polygon's exterior, coordinates[0][0] — exactly the
        # reference's reading (group.py:154-157, geojson_polygon.py:19-22)
        F.expr(
            "CASE WHEN f.geometry.type = 'MultiPolygon' THEN"
            " try_element_at(try_element_at(from_json(f.geometry.coordinates,"
            "   'array<array<array<array<double>>>>'), 1), 1)"
            " WHEN f.geometry.type = 'Polygon' THEN"
            " try_element_at(from_json(f.geometry.coordinates,"
            "   'array<array<array<double>>>'), 1)"
            " ELSE NULL END"
        ).alias("ring0"),
        # line features (geojson_line.py:39-42): LineString takes the
        # coordinates, MultiLineString the FIRST line
        F.expr(
            "CASE WHEN f.geometry.type = 'LineString' THEN"
            " from_json(f.geometry.coordinates, 'array<array<double>>')"
            " WHEN f.geometry.type = 'MultiLineString' THEN"
            " try_element_at(from_json(f.geometry.coordinates,"
            "   'array<array<array<double>>>'), 1)"
            " ELSE NULL END"
        ).alias("line"),
        # reference width rule (geojson_line.py:26-37): positive property
        # value, else the class default 2
        F.expr(
            "CASE WHEN f.properties.WIDTH IS NOT NULL AND f.properties.WIDTH > 0"
            " THEN f.properties.WIDTH ELSE 2.0D END"
        ).alias("line_width"),
    ).select(
        "*",
        # drop the closing duplicate vertex, as the reference does
        # (group.py:155-157: coordinates[0][:-1]); line features get their
        # exterior ring from the G5 buffer kernel below
        F.expr(
            "CASE WHEN size(ring0) > 1"
            " AND ring0[0] = element_at(ring0, -1)"
            " THEN slice(ring0, 1, size(ring0) - 1)"
            " ELSE ring0 END"
        ).alias("ring"),
    ).drop("ring0")
    # reference degenerate-line rule (geojson_line.py:44-47): a line with
    # identical consecutive coordinates is rejected. A < 2-point line is
    # rejected too (nothing to buffer) — and must be guarded BEFORE the
    # exists(): sequence(1, 0) yields the descending range [1, 0] and
    # line[1] on a 1-point array throws INVALID_ARRAY_INDEX under ANSI
    # mode, turning one malformed feature into a whole-scan failure.
    feats = feats.where(
        F.expr(
            "line IS NULL OR (size(line) >= 2 AND NOT exists("
            "sequence(1, size(line) - 1), i -> line[i] = line[i - 1]))"
        )
    )
    feats = feats.withColumn(
        "ring",
        F.when(F.col("line").isNotNull(), _buffer_lines("line", "line_width"))
        .otherwise(F.col("ring")),
    ).drop("line", "line_width")
    feats = feats.select(
        "*",
        F.expr(
            "aggregate(ring, 0.0D, (acc, p) -> acc + p[0]) / size(ring)"
        ).alias("x"),
        F.expr(
            "aggregate(ring, 0.0D, (acc, p) -> acc + p[1]) / size(ring)"
        ).alias("y"),
    )
    if apply_prec_filter:
        feats = feats.where(
            (F.col("prec_alti").isNull()) | (F.col("prec_alti") < 9999)
        )
    return feats
