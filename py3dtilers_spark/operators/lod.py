"""LOD chain construction (reference H1/H2: LodTree,
/root/reference/py3dtilers/Common/lod_tree.py:14-54; geometric-error defaults
leaf=1 geometry_node.py:17, LOD1=5 lod1_node.py:10, LOA=20 loa_node.py:12,
root=500 tileset_creation.py:39).

The reference stacks, per group, a chain of ancestor nodes of decreasing
detail: [LOA(20) -> LOD1(5) -> leaf(1)] under one root(500). Here each chain
level is just MORE TILE ROWS derived from the same leaf aggregation — a
union of per-level projections, no extra scans or shuffles beyond the one
leaf-stats aggregation.

LOD payload decimation (texture downsample factors 3,13,23..., lod_node.py)
maps to the encoder UDF taking a `decimation` argument per level.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GE_LEAF = 1.0
GE_LOD1 = 5.0
GE_LOA = 20.0
GE_ROOT = 500.0


def lod_chain(tiled: DataFrame, with_loa: bool = True, with_lod1: bool = True) -> DataFrame:
    """Input: rows with tile_id + x/y/z. Output: tile tree rows
    (tile_id, parent_id, level_kind, geometric_error, n_features, bbox cols)
    with the reference's chain root -> [loa ->] [lod1 ->] leaf per group.

    Chain node ids are suffixed paths (tile_id + '/lod1' etc.) so the tree
    stays a prefix hierarchy; every chain node shares the leaf's bbox (the
    reference's LOA/LOD1 nodes wrap the same features at lower detail).
    """
    leaf = tiled.groupBy("tile_id").agg(
        F.count(F.lit(1)).alias("n_features"),
        F.min("x").alias("xmin"), F.max("x").alias("xmax"),
        F.min("y").alias("ymin"), F.max("y").alias("ymax"),
        F.min("z").alias("zmin"), F.max("z").alias("zmax"),
    )
    box = ["n_features", "xmin", "xmax", "ymin", "ymax", "zmin", "zmax"]

    levels = []  # (kind, ge) outermost first
    if with_loa:
        levels.append(("loa", GE_LOA))
    if with_lod1:
        levels.append(("lod1", GE_LOD1))
    levels.append(("leaf", GE_LEAF))

    parts = []
    parent_of_outer = F.lit("")
    for i, (kind, ge) in enumerate(levels):
        node_id = (
            F.col("tile_id")
            if kind == "leaf"
            else F.concat(F.col("tile_id"), F.lit(f"/{kind}"))
        )
        if i == 0:
            parent = parent_of_outer
        else:
            pk = levels[i - 1][0]
            parent = F.concat(F.col("tile_id"), F.lit(f"/{pk}"))
        parts.append(
            leaf.select(
                node_id.alias("node_id"),
                parent.alias("parent_id"),
                F.lit(kind).alias("level_kind"),
                F.lit(ge).alias("geometric_error"),
                *box,
            )
        )

    root = leaf.agg(
        F.sum("n_features").alias("n_features"),
        F.min("xmin").alias("xmin"), F.max("xmax").alias("xmax"),
        F.min("ymin").alias("ymin"), F.max("ymax").alias("ymax"),
        F.min("zmin").alias("zmin"), F.max("zmax").alias("zmax"),
    ).select(
        F.lit("").alias("node_id"),
        F.lit(None).cast("string").alias("parent_id"),
        F.lit("root").alias("level_kind"),
        F.lit(GE_ROOT).alias("geometric_error"),
        *box,
    )

    out = root
    for p in parts:
        out = out.unionByName(p)
    return out


def vertical_hierarchy(tile_tables: list[DataFrame]) -> DataFrame:
    """H2 (lod_tree.py:45-54): chain N whole tilesets as successive LOD
    ancestors — tileset i becomes the parent level of tileset i+1. Input:
    list of leaf-tile stats DataFrames ordered fine -> coarse."""
    out = None
    n = len(tile_tables)
    for i, t in enumerate(tile_tables):
        ge = GE_LEAF if i == 0 else GE_LOD1 * i
        lvl = (
            t.withColumn("level_idx", F.lit(i))
            .withColumn("geometric_error", F.lit(float(ge)))
        )
        out = lvl if out is None else out.unionByName(lvl)
    return out.withColumn("n_levels", F.lit(n))
