"""Grid/cube group merge (reference A4) and the full polygon-grouping op.

Reference (/root/reference/py3dtilers/Common/group.py:201-239): each group's
centroid (mean of member centroids, feature.py:216-227) is snapped to the
nearest multiple of cube_size with Python round() — banker's rounding — and
groups sharing a cube merge. Spark's ``rint`` is the same half-to-even rule
(java.lang.Math.rint), so parity is exact; DuckDB's ``round_even`` matches.

The whole op is two hash aggregations — partial (map-side) combine applies
to both, so at 10^12 rows the shuffle carries only group/cube partials.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snap_to_cube(col, cube_size: float = 1000.0):
    """base * round_half_even(v / base) — parity with Python round()
    (group.py:27-38)."""
    return F.expr(f"rint(({col}) / {cube_size})") * F.lit(cube_size)


def cube_merge_groups(
    features_with_group: DataFrame, cube_size: float = 1000.0
) -> DataFrame:
    """Input: features + ``group_key`` column. Output: one row per merged
    cube group: (cube_x, cube_y, cube_z, n_groups, n_features).

    Mirrors distribute_groups_in_cubes (group.py:201-224): centroids are
    per-GROUP means first, then snapped; merging = groupBy on the cube.
    """
    group_cent = features_with_group.groupBy("group_key").agg(
        F.avg("x").alias("cx"),
        F.avg("y").alias("cy"),
        F.avg("z").alias("cz"),
        F.count(F.lit(1)).alias("n_features"),
    )
    return (
        group_cent.withColumn("cube_x", snap_to_cube("cx", cube_size))
        .withColumn("cube_y", snap_to_cube("cy", cube_size))
        .withColumn("cube_z", snap_to_cube("cz", cube_size))
        .groupBy("cube_x", "cube_y", "cube_z")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("n_features").alias("n_features"),
        )
    )


def group_by_polygons_and_cubes(
    features: DataFrame, rects: DataFrame, cube_size: float = 1000.0
) -> DataFrame:
    """The reference's full grouping pipeline
    (distribute_objects_in_polygons -> distribute_groups_in_cubes,
    group.py:161-224): polygon first-match assignment, singleton groups for
    unmatched features, then cube merge of group centroids."""
    from .pip_join import pip_assign_rect

    assign = pip_assign_rect(features, rects)
    fg = (
        features.join(assign, "image_id")
        .withColumn(
            "group_key",
            F.when(
                F.col("polygon_id").isNotNull(),
                F.concat(F.lit("poly_"), F.col("polygon_id").cast("string")),
            ).otherwise(F.concat(F.lit("solo_"), F.col("image_id"))),
        )
    )
    return cube_merge_groups(fg, cube_size)
