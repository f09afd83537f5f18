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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GEOJSON_SCHEMA = """
  type STRING,
  features ARRAY<STRUCT<
    type: STRING,
    properties: STRUCT<
      ID: STRING, HAUTEUR: DOUBLE, PREC_ALTI: DOUBLE, NATURE: STRING, Z_MIN: DOUBLE
    >,
    geometry: STRUCT<type: STRING, coordinates: ARRAY<ARRAY<ARRAY<DOUBLE>>>>
  >>
"""


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
        # drop the closing duplicate vertex, as the reference does
        # (group.py:155-157: coordinates[0][:-1])
        F.expr(
            "CASE WHEN size(f.geometry.coordinates[0]) > 1"
            " AND f.geometry.coordinates[0][0] = element_at(f.geometry.coordinates[0], -1)"
            " THEN slice(f.geometry.coordinates[0], 1, size(f.geometry.coordinates[0]) - 1)"
            " ELSE f.geometry.coordinates[0] END"
        ).alias("ring"),
    )
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
