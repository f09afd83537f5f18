"""S3: distributed IFC STEP scan, against a synthetic fixture in the
ISO-10303-21 format (the shape of the reference's tests/ifc_tiler_test_data)."""
from py3dtilers_spark.sources.ifc_io import (
    ifc_class_counts,
    ifc_containment,
    ifc_entities,
    ifc_group_by_class_and_container,
    ifc_points_bbox,
    ifc_products,
)

IFC_TEXT = """ISO-10303-21;
HEADER;FILE_SCHEMA(('IFC4'));
ENDSEC;
DATA;
#1= IFCPERSON($,'X',$,$,$,$,$,$);
#10= IFCBUILDING('BLDG_A',#1,'Building A',$,$,$,$,$,$,$,$,$);
#11= IFCBUILDINGSTOREY('STOREY_A0',#1,'Ground',$,$,$,$,$,$,0.);
#20= IFCWALL('WALL_1',#1,'W1',$,$,$,$,$);
#21= IFCWALL('WALL_2',#1,'W2',$,$,$,$,$);
#22= IFCSLAB('SLAB_1',#1,'S1',$,$,$,$,$,.FLOOR.);
#23= IFCDOOR('DOOR_1',#1,'D1',$,$,$,$,$,2.1,0.9);
#30= IFCCARTESIANPOINT((0.,0.,0.));
#31= IFCCARTESIANPOINT((12.5,0.,0.));
#32= IFCCARTESIANPOINT((12.5,8.,3.2));
#33= IFCCARTESIANPOINT((-1.,8.));
#40= IFCRELCONTAINEDINSPATIALSTRUCTURE('REL_1',#1,$,$,(#20,#21,#22),#11);
#41= IFCRELCONTAINEDINSPATIALSTRUCTURE('REL_2',#1,$,$,(#23),#10);
ENDSEC;
END-ISO-10303-21;
"""


def _fixture(tmp_path):
    p = tmp_path / "model.ifc"
    p.write_text(IFC_TEXT)
    return str(p)


def test_ifc_scan_and_counts(spark, tmp_path):
    ents = ifc_entities(spark, _fixture(tmp_path))
    counts = {r["ifc_class"]: r["n"] for r in ifc_class_counts(ents).collect()}
    assert counts["IFCWALL"] == 2
    assert counts["IFCCARTESIANPOINT"] == 4
    assert counts["IFCRELCONTAINEDINSPATIALSTRUCTURE"] == 2
    prods = {r["global_id"]: r["ifc_class"] for r in ifc_products(ents).collect()}
    assert prods == {
        "WALL_1": "IFCWALL", "WALL_2": "IFCWALL",
        "SLAB_1": "IFCSLAB", "DOOR_1": "IFCDOOR",
    }


def test_ifc_points_bbox(spark, tmp_path):
    ents = ifc_entities(spark, _fixture(tmp_path))
    bb = ifc_points_bbox(ents).collect()[0]
    assert bb["n_points"] == 4
    assert (bb["xmin"], bb["xmax"]) == (-1.0, 12.5)
    assert (bb["ymin"], bb["ymax"]) == (0.0, 8.0)
    assert (bb["zmin"], bb["zmax"]) == (0.0, 3.2)  # 2-D point defaults z=0


def test_ifc_group_by_class_and_container(spark, tmp_path):
    ents = ifc_entities(spark, _fixture(tmp_path))
    cont = {(r["container_id"], r["entity_id"]) for r in ifc_containment(ents).collect()}
    assert cont == {(11, 20), (11, 21), (11, 22), (10, 23)}
    groups = {
        (r["ifc_class"], r["container_gid"]): list(r["global_ids"])
        for r in ifc_group_by_class_and_container(ents).collect()
    }
    assert groups[("IFCWALL", "STOREY_A0")] == ["WALL_1", "WALL_2"]
    assert groups[("IFCSLAB", "STOREY_A0")] == ["SLAB_1"]
    assert groups[("IFCDOOR", "BLDG_A")] == ["DOOR_1"]
