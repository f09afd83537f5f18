"""UDF registry (SURVEY 2.9) + WKB decode (G8)."""
import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from py3dtilers_spark.functions import registry
from py3dtilers_spark.functions.spatial import (
    points_in_polygon,
    wkb_decode_points,
    wkb_decode_polygon,
    wkb_encode_point,
    wkb_encode_polygon,
)


def test_registry_builtin_and_custom(spark):
    assert "height_band" in registry.names()

    def double_w(w: pd.Series) -> pd.Series:
        return w * 2

    registry.register_udf("double_w", double_w, "long", doc="test")
    try:
        df = spark.range(5).selectExpr("id AS w", "CAST(id * 60 + 150 AS DOUBLE) AS z")
        out = df.select(
            registry.udf("double_w")(F.col("w")).alias("w2"),
            registry.udf("height_band")(F.col("z")).alias("band"),
        ).collect()
        assert [r["w2"] for r in out] == [0, 2, 4, 6, 8]
        assert [r["band"] for r in out] == ["low", "mid", "high", "high", "high"]
        # SQL surface
        registry.bind_sql(spark, "double_w")
        got = spark.sql("SELECT double_w(id) AS d FROM range(3)").collect()
        assert [r["d"] for r in got] == [0, 2, 4]
    finally:
        registry._REGISTRY.pop("double_w", None)


def test_wkb_point_roundtrip_spark(spark):
    pts = [(1843000.5, 5173100.25), (1850000.0, 5180000.75), (-3.5, 7.125)]
    pdf = pd.DataFrame({"wkb": [wkb_encode_point(x, y) for x, y in pts]})
    df = spark.createDataFrame(pdf)

    def decode(batches):
        for b in batches:
            x, y = wkb_decode_points(b["wkb"])
            yield pd.DataFrame({"x": x, "y": y})

    out = df.mapInPandas(decode, "x double, y double").toPandas()
    assert list(zip(out["x"], out["y"])) == pts


def test_wkb_polygon_roundtrip_and_pip():
    outer = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    hole = np.array([[4, 4], [6, 4], [6, 6], [4, 6]], float)
    blob = wkb_encode_polygon([outer, hole])
    rings = wkb_decode_polygon(blob)
    assert len(rings) == 2
    assert np.array_equal(rings[0][:-1], outer)  # closing vertex appended
    inside = points_in_polygon(np.array([5.0, 2.0]), np.array([5.0, 2.0]), rings[0][:-1])
    assert inside.tolist() == [True, True]
