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


def test_sharded_manifest_resolves_to_single(spark, sf_smoke, tmp_path):
    """K2 at 100x: executor-written per-prefix subtree tilesets + a stub
    root must resolve (external-tileset splice) to EXACTLY the single-file
    manifest — and the root file must hold only levels < shard_depth."""
    import json
    import os

    from py3dtilers_spark.operators.hierarchy import (
        read_manifest_resolved,
        write_manifest_sharded,
    )

    tree = _tree(spark, sf_smoke)
    single = manifest(tree)
    out = str(tmp_path / "sharded")
    os.makedirs(out, exist_ok=True)
    stub = write_manifest_sharded(tree, out, shard_depth=2)

    # stub root holds no node deeper than shard_depth
    def depth(node):
        kids = node.get("children", [])
        return 1 + max((depth(c) for c in kids), default=0)

    assert depth(stub["root"]) <= 3  # levels 0, 1, 2 (stub)
    subs = os.listdir(os.path.join(out, "sub"))
    assert len(subs) == len(
        {r["tile_id"][:2] for r in tree.where("length(tile_id) >= 2").collect()}
    )
    for s in subs:
        with open(os.path.join(out, "sub", s)) as fh:
            ext = json.load(fh)
        assert ext["root"]["tile_id"] == s[len("tileset_"):-len(".json")]

    resolved = read_manifest_resolved(out)
    assert resolved == single
