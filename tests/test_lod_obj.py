"""LOD chain parity (reference GE defaults 500/20/5/1) and OBJ source/sink."""
import os

from py3dtilers_spark.data import features_df
from py3dtilers_spark.operators.hierarchy import tile_tree
from py3dtilers_spark.operators.kd_tree import kd_assign
from py3dtilers_spark.operators.lod import GE_LEAF, GE_LOA, GE_LOD1, GE_ROOT, lod_chain
from py3dtilers_spark.sources.obj_io import read_obj, write_obj_boxes


def _tiled(spark, sf):
    feats = features_df(spark, sf).select("image_id", "x", "y", "z")
    return kd_assign(feats, kd_tree_max=500)


def test_lod_chain_structure(spark, sf_smoke):
    tree = lod_chain(_tiled(spark, sf_smoke))
    rows = {r["node_id"]: r for r in tree.collect()}
    root = rows[""]
    assert root["geometric_error"] == GE_ROOT == 500.0
    leaves = [r for r in rows.values() if r["level_kind"] == "leaf"]
    assert leaves and all(r["geometric_error"] == GE_LEAF for r in leaves)
    for leaf in leaves:
        lod1 = rows[leaf["node_id"] + "/lod1"]
        loa = rows[leaf["node_id"] + "/loa"]
        # chain: root -> loa(20) -> lod1(5) -> leaf(1), strictly decreasing
        assert leaf["parent_id"] == lod1["node_id"]
        assert lod1["parent_id"] == loa["node_id"]
        assert loa["parent_id"] == ""
        assert lod1["geometric_error"] == GE_LOD1 == 5.0
        assert loa["geometric_error"] == GE_LOA == 20.0
        assert (
            GE_ROOT > loa["geometric_error"] > lod1["geometric_error"] > leaf["geometric_error"]
        )
        # chain nodes wrap the same features/bbox as the leaf
        assert lod1["n_features"] == leaf["n_features"]
        assert (loa["xmin"], loa["xmax"]) == (leaf["xmin"], leaf["xmax"])
    # root counts roll up
    assert root["n_features"] == sum(r["n_features"] for r in leaves)


def test_lod_chain_without_loa(spark, sf_smoke):
    tree = lod_chain(_tiled(spark, sf_smoke), with_loa=False)
    kinds = {r["level_kind"] for r in tree.collect()}
    assert kinds == {"root", "lod1", "leaf"}


def test_obj_roundtrip(spark, sf_smoke, tmp_path):
    leaves = tile_tree(_tiled(spark, sf_smoke)).where("is_leaf")
    p = str(tmp_path / "tiles.obj")
    n_verts = write_obj_boxes(leaves, p)
    n_leaves = leaves.count()
    # global dedup: shared corners collapse, so verts < leaves * 8
    assert 8 <= n_verts <= n_leaves * 8
    objs = read_obj(spark, p).collect()
    assert len(objs) == 1  # single unnamed object
    r = objs[0]
    assert r["n_vertices"] == n_verts
    # centroid of dedup'd corners lies inside the global extent
    assert 1843000.0 <= r["x"] <= 1853000.0
    with open(p) as fh:
        lines = fh.readlines()
    assert sum(1 for ln in lines if ln.startswith("f ")) == n_leaves * 12


def test_vertical_hierarchy_levels(spark, sf_smoke):
    """H2: N whole tilesets chained fine -> coarse (lod_tree.py:45-54)."""
    from py3dtilers_spark.operators.hierarchy import tile_stats
    from py3dtilers_spark.operators.lod import vertical_hierarchy

    fine = tile_stats(_tiled(spark, sf_smoke))
    coarse = tile_stats(
        kd_assign(
            features_df(spark, sf_smoke).select("image_id", "x", "y", "z"),
            kd_tree_max=2000,
        )
    )
    vh = vertical_hierarchy([fine, coarse])
    rows = vh.collect()
    assert {r["level_idx"] for r in rows} == {0, 1}
    assert all(r["n_levels"] == 2 for r in rows)
    ge0 = {r["geometric_error"] for r in rows if r["level_idx"] == 0}
    ge1 = {r["geometric_error"] for r in rows if r["level_idx"] == 1}
    assert ge0 == {GE_LEAF} and ge1 == {GE_LOD1}
    # each level is a complete tileset: feature counts both sum to the total
    n0 = sum(r["n_features"] for r in rows if r["level_idx"] == 0)
    n1 = sum(r["n_features"] for r in rows if r["level_idx"] == 1)
    assert n0 == n1 > 0


def test_read_obj_mesh_full(spark, tmp_path):
    """S2 full: v/vt/vn/f scan with quads, uv, normals, multiple objects."""
    from py3dtilers_spark.sources.obj_io import read_obj_mesh

    obj = "\n".join([
        "o first",
        "v 0 0 0", "v 1 0 0", "v 1 1 0", "v 0 1 0",
        "vt 0 0", "vt 1 0", "vt 1 1", "vt 0 1",
        "vn 0 0 1",
        "f 1/1/1 2/2/1 3/3/1 4/4/1",   # quad -> 2 triangles
        "o second",
        "v 5 5 5 0.25 0.5 1", "v 6 5 5 0.25 0.5 1", "v 6 6 5 0 0 0",
        "f 5 6 7",                      # bare v refs + vertex colors
    ])
    p = tmp_path / "mesh.obj"
    p.write_text(obj + "\n")
    rows = read_obj_mesh(spark, str(p)).collect()
    assert len(rows) == 9  # 2 tris * 3 + 1 tri * 3
    first = [r for r in rows if r["obj_name"] == "first"]
    second = [r for r in rows if r["obj_name"] == "second"]
    assert len(first) == 6 and len(second) == 3
    # quad fan: triangles (v1,v2,v3) and (v1,v3,v4)
    t0 = sorted((r["px"], r["py"]) for r in first if r["tri"] == 0)
    assert t0 == [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0)]
    t1 = sorted((r["px"], r["py"]) for r in first if r["tri"] == 1)
    assert t1 == [(0.0, 0.0), (0.0, 1.0), (1.0, 1.0)]
    # uv + normal resolved on first object, absent on second
    assert all(r["u"] is not None and r["nz"] == 1.0 for r in first)
    assert all(r["u"] is None and r["nz"] is None for r in second)
    assert sorted((r["px"], r["py"], r["pz"]) for r in second) == [
        (5.0, 5.0, 5.0), (6.0, 5.0, 5.0), (6.0, 6.0, 5.0)]
    # vertex colors: present on second (the color leg of the reference's
    # format cross product), null on the color-less first object
    assert all(r["cr"] is None and r["cb"] is None for r in first)
    assert sorted((r["cr"], r["cg"], r["cb"]) for r in second) == [
        (0.0, 0.0, 0.0), (0.25, 0.5, 1.0), (0.25, 0.5, 1.0)]
