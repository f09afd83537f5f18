"""Round-2 oracle-checked queries: general-ring PIP + Morton prefilter (J1
general), kd tile assignment (O1, unrolled-SQL oracle), ring-table filters
and transforms (F4/F5/P5/P7/P8), and geometry kernels (G2/G3/G5/G7).

Ring/line inputs are synthesized deterministically from the features table
with SQL that is valid and value-identical in Spark and DuckDB (integer
vertex coordinates — every verified aggregate is exact integer math).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from .data.features import FEATURES_CTE, features_df, load_table, oracle_prelude
from .data.triangles import triangle_rings, triangles_cte
from .operators.geometry import (
    buffer_polyline,
    ear_clip,
    prism_extrude,
    ring_doubled_area,
    tri_doubled_areas,
    triangle_normals,
)
from .operators.pip_join import pip_assign_rings


def _feats(spark, sf_dir):
    return features_df(spark, sf_dir)

SPARK_GRID64 = "grid64 AS (SELECT id AS i FROM range(64))"

# ---------------------------------------------------------------------------
# Synthetic ring / line tables (portable SQL, shared verbatim by both engines)

RING_PARAMS_CTE = """
ring_params AS (
  SELECT image_id AS fid, h2,
         CAST(20 + h2 % 13 AS BIGINT) AS w1,
         CAST(5 + h2 % 7 AS BIGINT) AS w2,
         CAST(10 + h2 % 11 AS BIGINT) AS e1,
         CAST(25 + h2 % 17 AS BIGINT) AS e2,
         CAST(30 + h2 % 19 AS BIGINT) AS bh,
         CAST(h2 % 2 AS BIGINT) AS flip
  FROM features
  WHERE l_orderkey % 37 = 0
)""".strip()

# CCW L-shaped hexagon (concave at (w2, e1)); integer local coords
BASE_RING_CTE = """
base_ring AS (
  SELECT r.fid, r.h2, r.bh, g.i AS seq,
         CAST(CASE CAST(g.i AS INT) WHEN 0 THEN 0 WHEN 1 THEN r.w1
              WHEN 2 THEN r.w1 WHEN 3 THEN r.w2 WHEN 4 THEN r.w2
              ELSE 0 END AS BIGINT) AS vx,
         CAST(CASE CAST(g.i AS INT) WHEN 0 THEN 0 WHEN 1 THEN 0
              WHEN 2 THEN r.e1 WHEN 3 THEN r.e1 WHEN 4 THEN r.e2
              ELSE r.e2 END AS BIGINT) AS vy
  FROM ring_params r CROSS JOIN grid64 g
  WHERE g.i < 6
)""".strip()

# stored form: orientation flipped to CW for odd h2 + a closing vertex —
# the shape the reference's parser receives (geojson_polygon.py:56-67)
STORED_RING_CTE = """
stored_ring AS (
  SELECT fid, h2, bh,
         CAST(CASE WHEN h2 % 2 = 1 THEN 5 - seq ELSE seq END AS BIGINT) AS seq,
         vx, vy
  FROM base_ring
  UNION ALL
  SELECT fid, h2, bh, CAST(6 AS BIGINT) AS seq, CAST(0 AS BIGINT) AS vx,
         CAST(CASE WHEN h2 % 2 = 1 THEN e2 ELSE 0 END AS BIGINT) AS vy
  FROM ring_params
)""".strip()

# F5 input: stored ring at even positions + a NON-adjacent duplicate of
# vertex(seq=1) injected at position 5 for every third ring
F5_RING_CTE = """
f5_ring AS (
  SELECT fid, seq * 2 AS s, vx, vy FROM stored_ring
  UNION ALL
  SELECT fid, CAST(5 AS BIGINT) AS s, vx, vy
  FROM stored_ring WHERE seq = 1 AND h2 % 3 = 0
)""".strip()

# polylines: 4-point staircase; every fifth line gets an identical
# consecutive pair (the degenerate case geojson_line.py:44-47 rejects)
LINES_CTE = """
lines AS (
  SELECT r.fid, r.h2, g.i AS seq,
         CAST(CASE WHEN g.i = 2 AND r.h2 % 5 = 0 THEN 10 + r.w2
              ELSE 10 * g.i + r.w2 END AS BIGINT) AS px,
         CAST(CASE WHEN g.i = 2 AND r.h2 % 5 = 0 THEN r.e1
              WHEN g.i % 2 = 1 THEN r.e1 ELSE 0 END AS BIGINT) AS py
  FROM ring_params r CROSS JOIN grid64 g
  WHERE g.i < 4
)""".strip()

RING_CTES = [RING_PARAMS_CTE, BASE_RING_CTE, STORED_RING_CTE]


def _ring_sql(spark: SparkSession, sf_dir: str, ctes: list[str], body: str):
    """Run the shared CTE text on the Spark side (same text the oracle runs
    in DuckDB, modulo the grid64 spelling)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    sql = "WITH " + ",\n".join([SPARK_GRID64, FEATURES_CTE] + ctes) + "\n" + body
    return spark.sql(sql)


# ---------------------------------------------------------------------------
# J1 general rings: Morton-cell prefilter + vectorized ray-cast, first match
# wins (reference group.py:161-199 — the O(N*P) shapely loop, distributed)

def q_pip_rings(spark, sf_dir):
    feats = _feats(spark, sf_dir)
    return pip_assign_rings(feats, triangle_rings(), cell_size=1250.0)


def pip_rings_oracle_sql() -> str:
    # strict-interior sign test on the same CCW triangles (identical double
    # literals — data/triangles.py); interior == odd-crossings ray cast for
    # convex rings, and no sf0.01/sf0.1 centroid lies on any edge
    return oracle_prelude(extra_ctes=[triangles_cte()]) + """
SELECT f.image_id, min(t.polygon_id) AS polygon_id
FROM features f
LEFT JOIN tri t
  ON  ((t.bx - t.ax) * (f.y - t.ay) - (t.by - t.ay) * (f.x - t.ax)) > 0
  AND ((t.cx - t.bx) * (f.y - t.by) - (t.cy - t.by) * (f.x - t.bx)) > 0
  AND ((t.ax - t.cx) * (f.y - t.cy) - (t.ay - t.cy) * (f.x - t.cx)) > 0
GROUP BY f.image_id
"""


# ---------------------------------------------------------------------------
# O1 kd tile assignment — DuckDB oracle as an UNROLLED level-by-level split
# (the fixed-depth form of the reference recursion, kd_tree.py:4-42)

def kd_oracle_sql(kd_tree_max: int = 500, levels: int = 12) -> str:
    # levels = unrolled split depth; done-flag levels are no-ops, so 12
    # covers any sf the gate might run (sf0.01 needs 7, sf0.1 needs 11)
    sql = oracle_prelude() + ",\nlvl0 AS (SELECT image_id, x, y, CAST('' AS VARCHAR) AS tile_id, false AS done FROM features)"
    for d in range(levels):
        axis = "x" if d % 2 == 0 else "y"
        sql += f""",
lvl{d + 1} AS (
  SELECT image_id, x, y,
    CASE WHEN done THEN tile_id
         WHEN rn <= n // 2 THEN tile_id || '0'
         ELSE tile_id || '1' END AS tile_id,
    done OR ((n - n // 2) <= {kd_tree_max}) AS done
  FROM (
    SELECT image_id, x, y, tile_id, done,
           row_number() OVER (PARTITION BY tile_id ORDER BY {axis}, image_id) AS rn,
           count(*) OVER (PARTITION BY tile_id) AS n
    FROM lvl{d}) s
)"""
    sql += f"\nSELECT image_id, tile_id FROM lvl{levels}"
    return sql


# ---------------------------------------------------------------------------
# F5 ring-vertex dedup: global keep-first (reference geojson.py:338-393 uses
# a seen-set, so the closing vertex AND interior repeats both drop)

def q_ring_dedup(spark, sf_dir):
    """F5 ring-vertex dedup (keep-first seen-set, geojson.py:338-393)
    COMPOSED with P7 clockwise normalization (shoelace sign + reverse,
    geojson_polygon.py:56-67) — the reference applies exactly this pair in
    sequence when loading polygons. The deduped open ring has a variable
    vertex count, so the shoelace closes the ring via first_value and the
    CCW reversal maps seq -> (n-1) - seq."""
    ring = _ring_sql(
        spark, sf_dir, RING_CTES + [F5_RING_CTE],
        "SELECT fid, s, vx, vy FROM f5_ring",
    )
    w_first = Window.partitionBy("fid", "vx", "vy").orderBy("s")
    w_seq = Window.partitionBy("fid").orderBy("s")
    dedup = (
        ring.withColumn("_r", F.row_number().over(w_first))
        .where("_r = 1")
        .withColumn("seq", F.row_number().over(w_seq) - F.lit(1))
        .select("fid", "seq", "vx", "vy")
    )
    w = Window.partitionBy("fid").orderBy("seq")
    closed = dedup.withColumn(
        "nx", F.coalesce(F.lead("vx").over(w), F.first("vx").over(w))
    ).withColumn("ny", F.coalesce(F.lead("vy").over(w), F.first("vy").over(w)))
    shoe = closed.groupBy("fid").agg(
        F.sum(F.col("vx") * F.col("ny") - F.col("nx") * F.col("vy")).alias("area2"),
        F.count(F.lit(1)).alias("nv"),
    )
    return dedup.join(shoe, "fid").select(
        "fid",
        F.when(F.col("area2") > 0, F.col("nv") - 1 - F.col("seq"))
        .otherwise(F.col("seq"))
        .cast("bigint")
        .alias("new_seq"),
        "vx",
        "vy",
    )


def ring_dedup_oracle_sql() -> str:
    return oracle_prelude(extra_ctes=RING_CTES + [F5_RING_CTE]) + """
, dedup AS (
  SELECT fid, row_number() OVER (PARTITION BY fid ORDER BY s) - 1 AS seq,
         vx, vy
  FROM (
    SELECT fid, s, vx, vy,
           row_number() OVER (PARTITION BY fid, vx, vy ORDER BY s) AS r
    FROM f5_ring) t
  WHERE r = 1
), closed AS (
  SELECT fid, seq, vx, vy,
         coalesce(lead(vx) OVER w, first_value(vx) OVER w) AS nx,
         coalesce(lead(vy) OVER w, first_value(vy) OVER w) AS ny
  FROM dedup WINDOW w AS (PARTITION BY fid ORDER BY seq)
), shoe AS (
  SELECT fid, CAST(sum(vx * ny - nx * vy) AS BIGINT) AS area2,
         count(*) AS nv
  FROM closed GROUP BY fid
)
SELECT d.fid,
       CAST(CASE WHEN s.area2 > 0 THEN s.nv - 1 - d.seq ELSE d.seq END AS BIGINT) AS new_seq,
       d.vx, d.vy
FROM dedup d JOIN shoe s ON d.fid = s.fid
"""


# ---------------------------------------------------------------------------
# P8 roof-height adjust: roof-ring vertices translated down by the building
# height (reference geojson_polygon.py:68-77 adjust_height)

def q_roof_adjust(spark, sf_dir):
    ring = _ring_sql(
        spark, sf_dir, RING_CTES,
        "SELECT fid, h2, bh, seq, vx, vy FROM stored_ring",
    )
    return ring.select(
        "fid",
        "seq",
        "vx",
        "vy",
        (F.lit(200) + F.col("h2") % 31 - F.col("bh")).cast("bigint").alias("vz"),
    )


def roof_oracle_sql() -> str:
    return oracle_prelude(extra_ctes=RING_CTES) + """
SELECT fid, seq, vx, vy, CAST(200 + h2 % 31 - bh AS BIGINT) AS vz
FROM stored_ring
"""


# ---------------------------------------------------------------------------
# F4 degenerate-line filter: reject the whole polyline when two consecutive
# points coincide (reference geojson_line.py:44-47)

def q_degenerate_lines(spark, sf_dir):
    lines = _ring_sql(
        spark, sf_dir, RING_CTES + [LINES_CTE],
        "SELECT fid, seq, px, py FROM lines",
    )
    w = Window.partitionBy("fid").orderBy("seq")
    bad = (
        lines.withColumn("nx", F.lead("px").over(w))
        .withColumn("ny", F.lead("py").over(w))
        .where("nx IS NOT NULL AND px = nx AND py = ny")
        .select("fid")
        .distinct()
    )
    return lines.join(bad, "fid", "left_anti").select("fid", "seq", "px", "py")


def degenerate_oracle_sql() -> str:
    return oracle_prelude(extra_ctes=RING_CTES + [LINES_CTE]) + """
SELECT fid, seq, px, py FROM lines l
WHERE NOT EXISTS (
  SELECT 1 FROM lines a JOIN lines b ON a.fid = b.fid AND b.seq = a.seq + 1
  WHERE a.fid = l.fid AND a.px = b.px AND a.py = b.py)
"""


# ---------------------------------------------------------------------------
# G2 ear-clip triangulation: n-2 triangles, doubled-area exactly the shoelace
# (kernel operators/geometry.ear_clip; integer invariants close the oracle)

_EARCLIP_SCHEMA = "fid string, n_tri bigint, area2 bigint"


def _base_ring_df(spark, sf_dir):
    return _ring_sql(
        spark, sf_dir, RING_CTES,
        "SELECT fid, bh, seq, vx, vy FROM base_ring",
    )


def _per_ring(df, row_fn, schema: str):
    """Run a per-ring kernel as ONE python stage over contiguous fid runs:
    hash-repartition on fid, sort each partition by (fid, seq), then stream
    Arrow batches through a single mapInPandas — a run that straddles a
    batch boundary is carried into the next batch, so every kernel call
    still sees its complete ring while the per-GROUP Arrow round-trip of
    groupBy().applyInPandas (one python invocation + schema exchange per
    tiny 6-row ring) collapses into one invocation per ~10^4-row batch.

    row_fn(fid, pdf_sorted_run) -> tuple of output values."""
    cols = [f.split(" ")[0] for f in schema.split(", ")]

    def gen(batches):
        carry = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if not len(pdf):
                continue
            last = pdf["fid"].iloc[-1]
            cut = pdf["fid"].searchsorted(last, side="left") if pdf["fid"].is_monotonic_increasing else (pdf["fid"] != last).sum()
            head, carry = pdf.iloc[:cut], pdf.iloc[cut:]
            if len(head):
                yield pd.DataFrame(
                    [row_fn(fid, g) for fid, g in head.groupby("fid", sort=False)],
                    columns=cols,
                )
        if carry is not None and len(carry):
            yield pd.DataFrame(
                [row_fn(fid, g) for fid, g in carry.groupby("fid", sort=False)],
                columns=cols,
            )

    return (
        df.repartition("fid")
        .sortWithinPartitions("fid", "seq")
        .mapInPandas(gen, schema)
    )


def q_earclip(spark, sf_dir):
    def fn(fid, pdf):
        ring = pdf[["vx", "vy"]].to_numpy(dtype=np.float64)
        tris = ear_clip(ring)
        return fid, len(tris), int(tri_doubled_areas(ring, tris).sum())

    return _per_ring(_base_ring_df(spark, sf_dir), fn, _EARCLIP_SCHEMA)


def earclip_oracle_sql() -> str:
    return oracle_prelude(extra_ctes=[RING_PARAMS_CTE]) + """
SELECT fid, CAST(4 AS BIGINT) AS n_tri,
       CAST(2 * (w1 * e1 + w2 * (e2 - e1)) AS BIGINT) AS area2
FROM ring_params
"""


# ---------------------------------------------------------------------------
# G3 prism extrusion: closed LOD1 solid; 2(n-2) cap + 2n side triangles,
# surface area exact (axis-aligned integer footprint)

_EXTRUDE_SCHEMA = "fid string, n_tri bigint, surface2 bigint"


def q_extrude(spark, sf_dir):
    def fn(fid, pdf):
        ring = pdf[["vx", "vy"]].to_numpy(dtype=np.float64)
        tris = prism_extrude(ring, 0.0, float(pdf["bh"].iloc[0]))
        _, dbl = triangle_normals(tris)
        return fid, len(tris), int(np.rint(dbl.sum()))

    return _per_ring(_base_ring_df(spark, sf_dir), fn, _EXTRUDE_SCHEMA)


def extrude_oracle_sql() -> str:
    return oracle_prelude(extra_ctes=[RING_PARAMS_CTE]) + """
SELECT fid, CAST(20 AS BIGINT) AS n_tri,
       CAST(2 * (2 * (w1 * e1 + w2 * (e2 - e1)) + (2 * w1 + 2 * e2) * bh) AS BIGINT) AS surface2
FROM ring_params
"""


# ---------------------------------------------------------------------------
# G7 triangle normals: distinct face directions of the prism (6 for any
# axis-aligned footprint) + total doubled area via |cross| — the normals
# kernel must agree with the closed-form surface

_NORMALS_SCHEMA = "fid string, n_dirs bigint, surface2 bigint"


def q_normals(spark, sf_dir):
    def fn(fid, pdf):
        ring = pdf[["vx", "vy"]].to_numpy(dtype=np.float64)
        tris = prism_extrude(ring, 0.0, float(pdf["bh"].iloc[0]))
        unit, dbl = triangle_normals(tris)
        dirs = {tuple(np.round(u, 9)) for u in unit}
        return fid, len(dirs), int(np.rint(dbl.sum()))

    return _per_ring(_base_ring_df(spark, sf_dir), fn, _NORMALS_SCHEMA)


def normals_oracle_sql() -> str:
    return oracle_prelude(extra_ctes=[RING_PARAMS_CTE]) + """
SELECT fid, CAST(6 AS BIGINT) AS n_dirs,
       CAST(2 * (2 * (w1 * e1 + w2 * (e2 - e1)) + (2 * w1 + 2 * e2) * bh) AS BIGINT) AS surface2
FROM ring_params
"""


# ---------------------------------------------------------------------------
# G5 line buffer: single horizontal segment (0,0)->(L,0) buffered at width
# 2*(1 + h2%4) -> exact rectangle (flat caps, miter joins)

_BUFFER_SCHEMA = "fid string, n_v bigint, area2 bigint"


def q_line_buffer(spark, sf_dir):
    params = _ring_sql(
        spark, sf_dir, [RING_PARAMS_CTE],
        "SELECT fid, CAST(20 + h2 % 23 AS BIGINT) AS len,"
        " CAST(2 * (1 + h2 % 4) AS BIGINT) AS width FROM ring_params",
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        fids, nvs, a2s = [], [], []
        for fid, ln, wd in zip(pdf["fid"], pdf["len"], pdf["width"]):
            line = np.array([[0.0, 0.0], [float(ln), 0.0]])
            ring = buffer_polyline(line, float(wd))
            fids.append(fid)
            nvs.append(len(ring))
            a2s.append(int(np.rint(ring_doubled_area(ring))))
        return pd.DataFrame(
            {
                "fid": pd.Series(fids, dtype=object),
                "n_v": pd.Series(nvs, dtype=np.int64),
                "area2": pd.Series(a2s, dtype=np.int64),
            }
        )

    return params.mapInPandas(lambda it: (fn(p) for p in it), _BUFFER_SCHEMA)


def line_buffer_oracle_sql() -> str:
    return oracle_prelude(extra_ctes=[RING_PARAMS_CTE]) + """
SELECT fid, CAST(4 AS BIGINT) AS n_v,
       CAST(2 * (20 + h2 % 23) * (2 * (1 + h2 % 4)) AS BIGINT) AS area2
FROM ring_params
"""


# ---------------------------------------------------------------------------
# A7 extrusion z-stats: per 1 km cube cell, building-height statistics
# (reference geojson.py:98-120 derives heights from z attributes; min/max
# are order-safe aggregates, the sum goes through the integer hash digit)

def q_zstats(spark, sf_dir):
    return (
        _feats(spark, sf_dir)
        .selectExpr(
            "rint(x / 1000.0) * 1000.0 AS cube_x",
            "rint(y / 1000.0) * 1000.0 AS cube_y",
            "z",
            "(h2 * 16807) % 1000 AS hz",
        )
        .groupBy("cube_x", "cube_y")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("z").alias("zmin"),
            F.max("z").alias("zmax"),
            F.sum("hz").alias("sum_hz"),
        )
    )


def zstats_oracle_sql() -> str:
    return oracle_prelude() + """
SELECT round_even(x / 1000.0, 0) * 1000.0 AS cube_x,
       round_even(y / 1000.0, 0) * 1000.0 AS cube_y,
       count(*) AS n, min(z) AS zmin, max(z) AS zmax,
       CAST(sum((h2 * 16807) % 1000) AS BIGINT) AS sum_hz
FROM features GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# J3 gml-id lookup join: broadcast dimension keyed by gml id (the reference's
# CityTiler building-id -> database-id resolution, citym_cityobject.py)

def q_gml_lookup(spark, sf_dir):
    feats = _feats(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").selectExpr(
        "p_partkey", "'GML_' || CAST(p_partkey AS STRING) AS gml_id", "p_size"
    )
    return (
        feats.join(F.broadcast(part), feats["l_partkey"] == part["p_partkey"])
        .where("p_size >= 48")
        .select("image_id", "gml_id", "p_size")
    )


def gml_lookup_oracle_sql() -> str:
    return oracle_prelude() + """
SELECT f.image_id, 'GML_' || CAST(p.p_partkey AS STRING) AS gml_id, p.p_size
FROM features f JOIN part p ON f.l_partkey = p.p_partkey
WHERE p.p_size >= 48
"""


# ---------------------------------------------------------------------------
# A8 atlas pow2 size estimate: per polygon group, the reference's
# multipleOf2(sqrt(sum of texture areas)) (Texture/atlas.py:41-66) —
# integer-exact via a powers-of-two join (no float log2 at the boundary)

def q_atlas_pow2(spark, sf_dir):
    from .data.features import polygons_df
    from .operators.pip_join import pip_assign_rect

    feats = _feats(spark, sf_dir)
    areas = (
        pip_assign_rect(feats, polygons_df(spark), carry=("w", "h"))
        .where("polygon_id IS NOT NULL")
        .groupBy("polygon_id")
        .agg(F.sum(F.expr("CAST(w AS BIGINT) * CAST(h AS BIGINT)")).alias("area"))
    )
    pows = spark.range(24).selectExpr("CAST(pow(2, id) AS BIGINT) AS side")
    return (
        areas.join(F.broadcast(pows), F.expr("side * side >= area"))
        .groupBy("polygon_id", "area")
        .agg(F.min("side").alias("atlas_side"))
        .select("polygon_id", "area", "atlas_side")
    )


def atlas_pow2_oracle_sql() -> str:
    return oracle_prelude() + """
, areas AS (
  SELECT polygon_id, CAST(sum(CAST(w AS BIGINT) * CAST(h AS BIGINT)) AS BIGINT) AS area
  FROM (
    SELECT f.image_id, f.w, f.h, min(p.polygon_id) AS polygon_id
    FROM features f
    LEFT JOIN polygons p
      ON f.x >= p.xmin AND f.x < p.xmax AND f.y >= p.ymin AND f.y < p.ymax
    GROUP BY 1, 2, 3) t
  WHERE polygon_id IS NOT NULL
  GROUP BY 1
), pows AS (SELECT CAST(power(2, i) AS BIGINT) AS side FROM grid64 WHERE i < 24)
SELECT a.polygon_id, a.area, min(p.side) AS atlas_side
FROM areas a JOIN pows p ON p.side * p.side >= a.area
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# G4 alpha-shape hull (reference polygon_extrusion.py:40-60 hull stage):
# per-feature point sets in PARABOLA position — outer points (i, i^2) are
# strictly convex and never concyclic (4 parabola points are concyclic iff
# their x-coords sum to 0; ours are all positive), interior points sit
# strictly between the parabola chain and the top chord with >= 1 margin —
# so hull size, Delaunay triangle count (Euler: 2n - 2 - h), and
# alpha=0 boundary-edge count (== hull size) are closed-form integers.

_ALPHA_SCHEMA = (
    "fid string, n_pts bigint, hull_size bigint, n_tri bigint, a0_edges bigint"
)


def q_alpha_shape(spark, sf_dir):
    from .operators.geometry import alpha_shape_edges, convex_hull, delaunay

    params = _ring_sql(
        spark, sf_dir, [RING_PARAMS_CTE],
        "SELECT fid, h2, 5 + h2 % 4 AS n_outer, 1 + h2 % 3 AS k FROM ring_params",
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for fid, h2, n_outer, k in zip(
            pdf["fid"], pdf["h2"], pdf["n_outer"], pdf["k"]
        ):
            n_outer, k = int(n_outer), int(k)
            xs = np.arange(n_outer, dtype=np.float64)
            outer = np.column_stack([xs, xs * xs])
            rng = np.random.default_rng(int(h2) % (2**31))
            inner = []
            for j in range(1, k + 1):
                span = j * (n_outer - 1 - j) - 1  # strict-interior slack
                d = 1 + (int(h2) + j) % max(span, 1)
                # y-jitter breaks accidental collinearity/cocircularity; the
                # [0.05, 0.45] band keeps the point strictly interior even at
                # maximal d (x stays exactly j so the chord bound d + 0.45 <
                # j * (n_outer - 1 - j) always holds)
                inner.append((float(j), j * j + d + rng.uniform(0.05, 0.45)))
            pts = np.vstack([outer, np.array(inner)])
            out.append(
                (
                    fid,
                    len(pts),
                    len(convex_hull(pts)),
                    len(delaunay(pts)),
                    len(alpha_shape_edges(pts, 0.0)),
                )
            )
        return pd.DataFrame(
            out, columns=["fid", "n_pts", "hull_size", "n_tri", "a0_edges"]
        )

    return params.mapInPandas(lambda it: (fn(p) for p in it), _ALPHA_SCHEMA)


def alpha_shape_oracle_sql() -> str:
    return oracle_prelude(extra_ctes=[RING_PARAMS_CTE]) + """
SELECT fid,
       CAST((5 + h2 % 4) + (1 + h2 % 3) AS BIGINT) AS n_pts,
       CAST(5 + h2 % 4 AS BIGINT) AS hull_size,
       CAST((5 + h2 % 4) + 2 * (1 + h2 % 3) - 2 AS BIGINT) AS n_tri,
       CAST(5 + h2 % 4 AS BIGINT) AS a0_edges
FROM ring_params
"""


def register(queries: dict) -> None:
    queries.update(
        {
            "pip_rings_first_match": (q_pip_rings, pip_rings_oracle_sql()),
            "alpha_shape": (q_alpha_shape, alpha_shape_oracle_sql()),
            "ring_dedup": (q_ring_dedup, ring_dedup_oracle_sql()),  # F5 + P7
            "roof_adjust": (q_roof_adjust, roof_oracle_sql()),
            "degenerate_lines": (q_degenerate_lines, degenerate_oracle_sql()),
            "earclip_tri": (q_earclip, earclip_oracle_sql()),
            "prism_extrude": (q_extrude, extrude_oracle_sql()),
            "tri_normals": (q_normals, normals_oracle_sql()),
            "line_buffer": (q_line_buffer, line_buffer_oracle_sql()),
            "zstats_cube": (q_zstats, zstats_oracle_sql()),
            "gml_lookup_join": (q_gml_lookup, gml_lookup_oracle_sql()),
            "atlas_pow2": (q_atlas_pow2, atlas_pow2_oracle_sql()),
        }
    )
