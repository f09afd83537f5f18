"""Bounding-volume nesting + geometric-error hierarchy invariants
(reference invariants: tileset_creation.py:117-119, :39; SURVEY.md section 5)."""
from py3dtilers_spark.data import features_df
from py3dtilers_spark.operators.hierarchy import (
    check_nesting,
    manifest,
    tile_tree,
)
from py3dtilers_spark.operators.kd_tree import kd_assign


def _tree(spark, sf):
    feats = features_df(spark, sf).select("image_id", "x", "y", "z")
    tiled = kd_assign(feats, kd_tree_max=100)
    return tile_tree(tiled)


def test_nesting_and_monotone_ge(spark, sf_smoke):
    tree = _tree(spark, sf_smoke)
    assert check_nesting(tree) == 0


def test_root_ge_is_500(spark, sf_smoke):
    tree = _tree(spark, sf_smoke)
    root = tree.where("tile_id = ''").collect()
    assert len(root) == 1
    assert root[0]["geometric_error"] == 500.0


def test_feature_counts_roll_up(spark, sf_smoke):
    tree = _tree(spark, sf_smoke)
    rows = {r["tile_id"]: r for r in tree.collect()}
    total = rows[""]["n_features"]
    leaf_sum = sum(r["n_features"] for r in rows.values() if r["is_leaf"])
    assert total == leaf_sum
    # every internal node's count equals the sum of its children
    kids = {}
    for tid, r in rows.items():
        if tid:
            kids.setdefault(tid[:-1], []).append(r["n_features"])
    for tid, r in rows.items():
        if not r["is_leaf"]:
            assert r["n_features"] == sum(kids[tid]), tid


def test_manifest_shape(spark, sf_smoke):
    m = manifest(_tree(spark, sf_smoke))
    assert m["root"]["geometricError"] == 500.0
    assert m["asset"]["generator"] == "py3dtilers_spark"

    def walk(n, parent_ge):
        assert n["geometricError"] < parent_ge
        box = n["boundingVolume"]["box"]
        # spec 12-number box: center + axis-aligned half-axis vectors
        assert len(box) == 12
        assert box[3] >= 0 and box[7] >= 0 and box[11] >= 0
        mm = n["bboxMinMax"]
        assert mm[0] <= mm[3] and mm[1] <= mm[4] and mm[2] <= mm[5]
        assert box[0] == (mm[0] + mm[3]) / 2.0 and box[3] == (mm[3] - mm[0]) / 2.0
        for c in n["children"]:
            walk(c, n["geometricError"])

    for c in m["root"]["children"]:
        walk(c, m["root"]["geometricError"])
