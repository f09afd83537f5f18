"""Sources + streaming: geojson scan (S1), tileset read-back/merge (S5/K5),
streaming window agg == batch result."""
import json
import os

import numpy as np
from pyspark.sql import functions as F

from py3dtilers_spark.data import features_df
from py3dtilers_spark.functions.imaging import decode, psnr, synth_pixels
from py3dtilers_spark.plans.tiler_job import run_tiler
from py3dtilers_spark.queries import q_events_window
from py3dtilers_spark.sources.geojson import read_geojson
from py3dtilers_spark.sources.tileset_io import (
    merge_tilesets,
    read_manifest,
    read_tiles,
    tiles_to_features,
)
from py3dtilers_spark.streaming.events import run_stream_to_memory


def _write_geojson(path):
    fc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {"ID": "BAT1", "HAUTEUR": 12.5, "PREC_ALTI": 1.5,
                               "NATURE": "Indifferenciee", "Z_MIN": 190.0},
                "geometry": {"type": "Polygon", "coordinates": [
                    [[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0], [0.0, 0.0]]]},
            },
            {
                "type": "Feature",
                "properties": {"ID": "BAT2", "HAUTEUR": -1.0, "PREC_ALTI": 9999.0,
                               "NATURE": None, "Z_MIN": None},
                "geometry": {"type": "Polygon", "coordinates": [
                    [[5.0, 5.0], [6.0, 5.0], [6.0, 6.0], [5.0, 6.0], [5.0, 5.0]]]},
            },
            {
                "type": "Feature",
                "properties": {"ID": "BAT3", "HAUTEUR": 0.0, "PREC_ALTI": 2.0,
                               "NATURE": "Eglise", "Z_MIN": 200.0},
                "geometry": {"type": "Polygon", "coordinates": [
                    [[20.0, 20.0], [30.0, 20.0], [25.0, 30.0], [20.0, 20.0]]]},
            },
            {
                "type": "Feature",
                "properties": {"ID": "BAT4", "HAUTEUR": 7.0, "PREC_ALTI": 1.0,
                               "NATURE": "Hangar", "Z_MIN": 100.0},
                # MultiPolygon: the reference reads ONLY the first polygon's
                # exterior ring (group.py:156-157 coordinates[0][0][:-1])
                "geometry": {"type": "MultiPolygon", "coordinates": [
                    [[[100.0, 0.0], [104.0, 0.0], [104.0, 4.0], [100.0, 4.0],
                      [100.0, 0.0]]],
                    [[[999.0, 999.0], [1000.0, 999.0], [1000.0, 1000.0],
                      [999.0, 999.0]]]]},
            },
            {
                "type": "Feature",
                "properties": {"ID": "ROAD1", "HAUTEUR": 3.0, "PREC_ALTI": 1.0,
                               "NATURE": "Route", "Z_MIN": 0.0, "WIDTH": 4.0},
                "geometry": {"type": "LineString", "coordinates": [
                    [0.0, 50.0], [10.0, 50.0]]},
            },
            {
                "type": "Feature",
                "properties": {"ID": "ROAD_BAD", "HAUTEUR": 3.0, "PREC_ALTI": 1.0,
                               "NATURE": "Route", "Z_MIN": 0.0},
                # identical consecutive coords -> rejected (geojson_line.py:44-47)
                "geometry": {"type": "LineString", "coordinates": [
                    [0.0, 0.0], [0.0, 0.0], [5.0, 0.0]]},
            },
            {
                "type": "Feature",
                "properties": {"ID": "ROAD2", "HAUTEUR": 3.0, "PREC_ALTI": 1.0,
                               "NATURE": "Route", "Z_MIN": 0.0},
                # MultiLineString: first line only; no WIDTH -> default 2
                "geometry": {"type": "MultiLineString", "coordinates": [
                    [[0.0, 80.0], [6.0, 80.0]],
                    [[500.0, 500.0], [600.0, 600.0]]]},
            },
            {
                "type": "Feature",
                "properties": {"ID": "ROAD_1PT", "HAUTEUR": 3.0,
                               "PREC_ALTI": 1.0, "NATURE": "Route",
                               "Z_MIN": 0.0},
                # malformed 1-point LineString: must be FILTERED, not fatal
                # (ANSI mode: the unguarded exists() threw
                # INVALID_ARRAY_INDEX and killed the whole scan)
                "geometry": {"type": "LineString", "coordinates": [
                    [1.0, 1.0]]},
            },
        ],
    }
    with open(path, "w") as fh:
        json.dump(fc, fh)


def test_geojson_source(spark, tmp_path):
    p = str(tmp_path / "b.geojson")
    _write_geojson(p)
    rows = {r["feature_id"]: r for r in read_geojson(spark, p).collect()}
    # PREC_ALTI >= 9999 filtered (geojson.py:98-102)
    assert set(rows) == {"BAT1", "BAT3", "BAT4", "ROAD1", "ROAD2"}
    assert rows["BAT1"]["height"] == 12.5
    assert rows["BAT3"]["height"] == 10.0  # HAUTEUR <= 0 -> default 10
    assert abs(rows["BAT1"]["x"] - 5.0) < 1e-9  # closing vertex dropped
    # MultiPolygon: first polygon's exterior only, closing vertex dropped
    b4 = rows["BAT4"]
    assert len(b4["ring"]) == 4 and abs(b4["x"] - 102.0) < 1e-9
    assert abs(b4["y"] - 2.0) < 1e-9  # the (999,1000) polygon is ignored
    # LineString buffered to a 4-vertex rectangle of total width WIDTH=4
    r1 = rows["ROAD1"]
    assert len(r1["ring"]) == 4
    ys = sorted(pt[1] for pt in r1["ring"])
    assert abs(ys[0] - 48.0) < 1e-9 and abs(ys[-1] - 52.0) < 1e-9
    assert abs(r1["x"] - 5.0) < 1e-9 and abs(r1["y"] - 50.0) < 1e-9
    # MultiLineString: first line only, default width 2
    r2 = rows["ROAD2"]
    ys2 = sorted(pt[1] for pt in r2["ring"])
    assert abs(ys2[0] - 79.0) < 1e-9 and abs(ys2[-1] - 81.0) < 1e-9
    assert abs(r2["x"] - 3.0) < 1e-9  # the (500,600) line is ignored
    unfiltered = read_geojson(spark, p, apply_prec_filter=False).count()
    assert unfiltered == 6  # ROAD_BAD + ROAD_1PT rejected, BAT2 kept


def test_tileset_roundtrip_and_merge(spark, sf_smoke, tmp_path):
    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    run_tiler(spark, sf_smoke, out_a, kd_tree_max=400)
    run_tiler(spark, sf_smoke, out_b, kd_tree_max=1000)

    # S5: tiles -> features inversion preserves ids/captions/payload fidelity
    feats = tiles_to_features(read_tiles(spark, out_a))
    orig = {
        r["image_id"]: (r["phash"], r["w"], r["h"], r["caption"])
        for r in features_df(spark, sf_smoke).collect()
    }
    got = feats.collect()
    assert len(got) == len(orig)
    for r in got[:50]:
        phash, w, h, cap = orig[r["image_id"]]
        assert r["caption"] == cap
        assert (r["w"], r["h"]) == (w, h)
        img = decode(bytes(r["payload"]))
        ref = synth_pixels(phash, w, h)
        assert psnr(ref, img) >= 40.0 or np.array_equal(img, ref)

    # K5/U2: merge under a fresh root
    merged_dir = str(tmp_path / "m")
    merged = merge_tilesets(spark, [out_a, out_b], merged_dir)
    na = read_tiles(spark, out_a).count()
    nb = read_tiles(spark, out_b).count()
    assert merged.count() == na + nb
    prefixes = {r["tile_id"].split("/")[0] for r in merged.select("tile_id").collect()}
    assert prefixes == {"t0", "t1"}
    m = read_manifest(merged_dir)
    assert len(m["root"]["children"]) == 2
    for child in m["root"]["children"]:
        assert child["geometricError"] < m["geometricError"]

    # every manifest tile_id must resolve against the merged tiles table
    # (merge re-prefixes BOTH sides)
    def leaf_ids(n):
        if not n["children"]:
            return {n["tile_id"]}
        return set().union(*(leaf_ids(c) for c in n["children"]))

    table_ids = {r["tile_id"] for r in merged.select("tile_id").collect()}
    manifest_leaves = leaf_ids(m["root"])
    assert manifest_leaves == table_ids

    # J5: zip-index join — every merged tile resolves to its source tileset
    # path through the positional (src_idx, prefix, path) dimension
    from py3dtilers_spark.sources.tileset_io import source_index, tiles_with_source

    srcs = source_index(spark, [out_a, out_b])
    resolved = tiles_with_source(merged, srcs)
    assert resolved.count() == na + nb  # total join (no orphan tiles)
    per_src = {
        r["path"]: r["n"]
        for r in resolved.groupBy("path").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_src == {out_a: na, out_b: nb}


def test_streaming_matches_batch(spark, sf_smoke):
    stream_out = run_stream_to_memory(spark, sf_smoke, name="ev_smoke").toPandas()
    batch = q_events_window(spark, sf_smoke).toPandas()
    key = ["bucket", "event_type"]
    a = stream_out.sort_values(key).reset_index(drop=True)
    b = batch.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b)
    assert (a["n"].to_numpy() == b["n"].to_numpy()).all()
    assert (a["value_e4"].to_numpy() == b["value_e4"].to_numpy()).all()


def test_catalog_seam_parquet_path(spark, tmp_path):
    """The table-format seam: parquet stand-in reads/writes; iceberg:
    names demand the Iceberg runtime (absent here) and snapshot pinning is
    rejected for plain paths."""
    import pytest

    from py3dtilers_spark.sources.catalog import read_table, write_table

    df = spark.range(5).selectExpr("id", "id * 2 AS v")
    path = str(tmp_path / "t")
    write_table(df, path, mode="overwrite")
    back = read_table(spark, path)
    assert back.count() == 5 and set(back.columns) == {"id", "v"}
    with pytest.raises(ValueError):
        read_table(spark, path, snapshot_id=3)
