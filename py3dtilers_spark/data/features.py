"""The `features` table: image+caption rows per BASELINE.json input_hint.

Schema (input_hint): image_id string, bytes binary, w int, h int, fmt string,
caption string, phash bigint — plus derived centroid (x, y, z) in a metric CRS
(EPSG:3946-like Lyon coordinates, matching the reference's test fixtures,
/root/reference/tests/test_tiler.py:18-40) and prec_alti (the reference's
PREC_ALTI filter attribute, py3dtilers/GeojsonTiler/geojson.py:98-102).

The table is DERIVED DETERMINISTICALLY from the driver's lineitem parquet via
pure integer arithmetic that Spark and DuckDB evaluate bit-identically — this
is what lets every downstream operator have an exact DuckDB oracle. The
`bytes` column (the only non-SQL-expressible column) is attached Spark-side
by a vectorized Arrow generator and is never part of oracle-checked output.

The derivation is one hash aggregation (the driver's lineitem has duplicate
keys, so _f0 dedups on the 4-part key) followed by a pure projection; column
pruning and predicate pushdown still reach the parquet scan. A production
Iceberg source with unique image_id would make it a zero-shuffle projection.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# h2: 31-bit-ish mixing hash of the lineitem key, bounded so every product
# below stays within int64 under ANSI overflow checking (both engines).
_H2 = (
    "((l_orderkey % 1000003) * 999983 + l_suppkey * 10007 "
    "+ CAST(l_linenumber AS BIGINT) * 7919 + l_partkey * 104729) % 1000000007"
)

# (l_orderkey, l_linenumber) is NOT unique in the driver's lineitem, so the
# feature key is the full 4-part key, deduplicated in _f0 below (min() over
# l_returnflag keeps the derivation deterministic in both engines).
_IMAGE_ID = (
    "'img_' || CAST(l_orderkey AS STRING) || '_' || CAST(l_linenumber AS STRING)"
    " || '_' || CAST(l_partkey AS STRING) || '_' || CAST(l_suppkey AS STRING)"
)

# Shared column expressions (valid, value-identical SQL in Spark and DuckDB).
FEATURE_EXPRS = [
    f"{_IMAGE_ID} AS image_id",
    "CAST(16 + (h2 % 49) AS INT) AS w",
    "CAST(16 + ((h2 * 131) % 49) AS INT) AS h",
    "CASE WHEN h2 % 4 = 0 THEN 'png' ELSE 'jpg' END AS fmt",
    "'caption ' || CAST(l_partkey AS STRING) || ' ' || l_returnflag AS caption",
    "(h2 * 2654435761) % 4611686018427387903 AS phash",
    "1843000.0 + CAST((h2 * 48271) % 100000 AS DOUBLE) / 10.0 AS x",
    "5173000.0 + CAST((h2 * 69621) % 100000 AS DOUBLE) / 10.0 AS y",
    "180.0 + CAST((h2 * 16807) % 1000 AS DOUBLE) / 10.0 AS z",
    "CAST(h2 % 12000 AS DOUBLE) AS prec_alti",
    "l_orderkey",
    "l_partkey",
    "h2",
]

FEATURES_CTE = f"""
_f0 AS (
  SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
         min(l_returnflag) AS l_returnflag,
         {_H2} AS h2
  FROM lineitem
  GROUP BY l_orderkey, l_partkey, l_suppkey, l_linenumber
),
features AS (
  SELECT {', '.join(FEATURE_EXPRS)} FROM _f0
)
""".strip()

# Grouping/LOA overlay polygons (reference: Groups.group_objects_by_polygons,
# py3dtilers/Common/group.py:129-159; fixture shape per FIXTURES.md T2).
# 8x8 grid of 1400 m rectangles on a 1250 m pitch over the feature extent
# [1843000, 1853000) x [5173000, 5183000): rectangles OVERLAP by 150 m
# (exercises first-match-wins) and every 5th is dropped (holes -> singleton
# groups, group.py:195-197).
POLYGONS_CTE = """
polygons AS (
  SELECT CAST(i AS INT) AS polygon_id,
         1843000.0 + CAST(i % 8 AS DOUBLE) * 1250.0 - 75.0  AS xmin,
         5173000.0 + CAST((i - (i % 8)) AS DOUBLE) / 8.0 * 1250.0 - 75.0 AS ymin,
         1843000.0 + CAST(i % 8 AS DOUBLE) * 1250.0 + 1325.0 AS xmax,
         5173000.0 + CAST((i - (i % 8)) AS DOUBLE) / 8.0 * 1250.0 + 1325.0 AS ymax
  FROM grid64
  WHERE i % 5 <> 0
)
""".strip()

# DuckDB spelling of the 0..63 relation; Spark side uses spark.range(64).
DUCK_GRID64 = "grid64 AS (SELECT CAST(g AS BIGINT) AS i FROM range(64) t(g))"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def features_df(spark: SparkSession, sf_dir: str, with_bytes: bool = False) -> DataFrame:
    """The canonical features DataFrame for a scale-factor directory.

    Pure projection over the lineitem scan (no shuffle); column pruning and
    predicate pushdown flow through to parquet because every output column is
    a deterministic expression of scanned columns.
    """
    li = load_table(spark, sf_dir, "lineitem")
    f0 = (
        li.groupBy("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
        .agg(F.expr("min(l_returnflag)").alias("l_returnflag"))
        .selectExpr("*", f"{_H2} AS h2")
    )
    df = f0.selectExpr(*FEATURE_EXPRS)
    if with_bytes:
        from .synth_images import attach_bytes

        df = attach_bytes(df)
    return df


def features_amplified(spark: SparkSession, sf_dir: str, copies: int) -> DataFrame:
    """Scale-out input for throughput/scaling benchmarks: `copies` spatially
    offset, id/phash-salted replicas of the features table (one scan + a
    broadcast cross join — no union chain, no extra files). Each copy lands
    in its own 10 km tile of a grid, so the kd tree deepens naturally as if
    the survey area grew."""
    feats = features_df(spark, sf_dir)
    reps = spark.range(copies).selectExpr("CAST(id AS BIGINT) AS copy_i")
    return (
        feats.crossJoin(F.broadcast(reps))
        .selectExpr(
            "'c' || CAST(copy_i AS STRING) || '_' || image_id AS image_id",
            "w", "h", "fmt", "caption",
            "(phash + copy_i * 1000000007) % 4611686018427387903 AS phash",
            "x + CAST(copy_i % 4 AS DOUBLE) * 10000.0 AS x",
            "y + CAST(CAST((copy_i - copy_i % 4) AS DOUBLE) / 4.0 AS DOUBLE) * 10000.0 AS y",
            "z", "prec_alti", "l_orderkey", "l_partkey", "h2",
        )
    )


def polygons_df(spark: SparkSession) -> DataFrame:
    """Overlay polygons as a small dimension table (broadcast side of J1)."""
    return (
        spark.range(64)
        .selectExpr("CAST(id AS BIGINT) AS i")
        .where("i % 5 <> 0")
        .selectExpr(
            "CAST(i AS INT) AS polygon_id",
            "1843000.0 + CAST(i % 8 AS DOUBLE) * 1250.0 - 75.0 AS xmin",
            "5173000.0 + CAST((i - (i % 8)) AS DOUBLE) / 8.0 * 1250.0 - 75.0 AS ymin",
            "1843000.0 + CAST(i % 8 AS DOUBLE) * 1250.0 + 1325.0 AS xmax",
            "5173000.0 + CAST((i - (i % 8)) AS DOUBLE) / 8.0 * 1250.0 + 1325.0 AS ymax",
        )
    )


def oracle_prelude(extra_ctes: list[str] | None = None) -> str:
    """WITH-clause prefix for DuckDB oracle SQL over the same tables."""
    ctes = [DUCK_GRID64, POLYGONS_CTE, FEATURES_CTE]
    if extra_ctes:
        ctes.extend(extra_ctes)
    return "WITH " + ",\n".join(ctes)
