"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship tiling pipeline at sf0.001 (kd partition ->
                  bounding-volume tree roll-up), returns the tile tree.
queries()      -> one callable per implemented operator (SURVEY.md section 2
                  + training-data ops), each (spark, sf_dir) -> DataFrame.
oracle_sql()   -> matching DuckDB SQL for every SQL-expressible operator.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from py3dtilers_spark.data import features_df  # noqa: E402
from py3dtilers_spark.operators.hierarchy import tile_tree  # noqa: E402
from py3dtilers_spark.operators.kd_tree import kd_assign  # noqa: E402
from py3dtilers_spark.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: kd-tree tile partition of
    the image+caption feature table + one-shuffle bounding-volume hierarchy
    roll-up (the reference's Groups -> GeometryTree -> tileset spine)."""
    feats = features_df(spark, "/root/testdata/sf0.001").select("image_id", "x", "y", "z")
    tiled = kd_assign(feats, kd_tree_max=500)
    return tile_tree(tiled).select(
        "tile_id", "parent_id", "level", "is_leaf", "geometric_error",
        "n_features", "xmin", "xmax", "ymin", "ymax", "zmin", "zmax",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in QUERIES.items() if sql is not None}
