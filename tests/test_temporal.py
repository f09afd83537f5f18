"""S7 temporal-graph file scan + blend pipeline, against a fixture in the
reference's GraphML-JSON format (the 3DUse ChangeDetection output,
/root/reference/tests/city_temporal_tiler_test_data/graph_2009-2012.json)."""
import json

from py3dtilers_spark.operators.temporal import (
    collapse_lineages,
    dedup_edges,
    edge_type_counts,
    read_temporal_graphs,
    reconcile_nodes,
    resolve_edges,
    timestamps,
    transactions,
)

# two overlapping graph files, reference format (ints as strings — the
# boost::ptree quirk the reference fixes up after parsing)
GRAPH_A = {
    "nodes": [
        {"id": "1", "globalid": "2009::BLD_1"},
        {"id": "2", "globalid": "2012::BLD_1"},
        {"id": "3", "globalid": "2009::BLD_2"},
        {"id": "4", "globalid": "2012::BLD_2"},
    ],
    "edges": [
        {"id": "1", "source": "1", "target": "2", "type": "replace", "tags": "unchanged"},
        {"id": "2", "source": "3", "target": "4", "type": "replace", "tags": "modified"},
        # duplicate of edge 1 (U6 input)
        {"id": "3", "source": "1", "target": "2", "type": "replace", "tags": "unchanged"},
    ],
}
GRAPH_B = {
    "nodes": [
        {"id": "1", "globalid": "2012::BLD_1"},  # same gid as A's node 2 (J7)
        {"id": "2", "globalid": "2015::BLD_1"},
        {"id": "3", "globalid": "2012::BLD_2"},
        {"id": "4", "globalid": "2015::BLD_9"},
    ],
    "edges": [
        {"id": "1", "source": "1", "target": "2", "type": "replace", "tags": "re-ided"},
        {"id": "2", "source": "3", "target": "4", "type": "replace", "tags": "re-ided"},
    ],
}


def _write(tmp_path):
    pa = tmp_path / "graph_2009-2012.json"
    pb = tmp_path / "graph_2012-2015.json"
    pa.write_text(json.dumps(GRAPH_A))
    pb.write_text(json.dumps(GRAPH_B))
    return [str(pa), str(pb)]


def test_scan_reconcile_dedup(spark, tmp_path):
    nodes, edges = read_temporal_graphs(spark, _write(tmp_path))
    assert nodes.count() == 8 and edges.count() == 5
    rec = {r["gid"]: (r["first_file"], r["n_files"]) for r in reconcile_nodes(nodes).collect()}
    assert len(rec) == 6  # both 2012 nodes are shared across files
    assert rec["2012::BLD_1"] == (0, 2)
    assert rec["2012::BLD_2"] == (0, 2)
    ded = dedup_edges(resolve_edges(edges, nodes))
    assert ded.count() == 4  # duplicate edge removed
    counts = {r["tags"]: r["n_edges"] for r in edge_type_counts(ded).collect()}
    assert counts == {"unchanged": 1, "modified": 1, "re-ided": 2}


def test_timestamps_and_lineage(spark, tmp_path):
    nodes, edges = read_temporal_graphs(spark, _write(tmp_path))
    rec = reconcile_nodes(nodes)
    ts = {r["ts"]: r["n_nodes"] for r in timestamps(rec).collect()}
    assert ts == {2009: 2, 2012: 2, 2015: 2}
    ded = dedup_edges(resolve_edges(edges, nodes))
    lin = {r["gid"]: (r["start_year"], r["end_year"], r["chain_len"])
           for r in collapse_lineages(rec, ded).collect()}
    # BLD_1: 2009 -unchanged-> 2012 -re-ided-> 2015 collapses to one lineage
    assert lin["2015::BLD_1"] == (2009, 2015, 3)
    # BLD_2's 2012->2015 edge is re-ided 1-1: collapses into 2015::BLD_9;
    # its 2009->2012 'modified' edge does NOT collapse
    assert lin["2015::BLD_9"] == (2012, 2015, 2)
    assert lin["2009::BLD_2"] == (2009, 2009, 1)
    tx = transactions(ded).collect()
    assert len(tx) == 1 and tx[0]["source"] == "2009::BLD_2"
    assert (tx[0]["start_year"], tx[0]["end_year"]) == (2009, 2012)


def test_collapse_fusions_and_subdivisions(spark, tmp_path):
    """H6 stages 2-3 (temporal_graph.py:1013-1112): fusion absorbs same-date
    ancestors (in-edges rewired down to the heir); subdivision REMOVES the
    subdivided node — its descendants survive with the node's start date,
    and with a single ancestor the subdivision edges are retagged
    'subdivided,modified' and rewired up to it
    (split_edge_and_remove_descendant, temporal_graph.py:732-773)."""
    import json as _json

    from py3dtilers_spark.operators.temporal import (
        collapse_fusions,
        collapse_subdivisions,
    )

    graph = {
        "nodes": [
            {"id": "1", "globalid": "2009::A"},
            {"id": "2", "globalid": "2009::B"},
            {"id": "3", "globalid": "2012::AB"},     # A + B fuse into AB
            {"id": "4", "globalid": "2015::AB1"},    # AB subdivides
            {"id": "5", "globalid": "2015::AB2"},
            {"id": "6", "globalid": "2006::A0"},     # A's own ancestor
            {"id": "7", "globalid": "2018::Z"},      # AB2's descendant
        ],
        "edges": [
            {"id": "1", "source": "1", "target": "3", "type": "replace", "tags": "fused"},
            {"id": "2", "source": "2", "target": "3", "type": "replace", "tags": "fused"},
            {"id": "3", "source": "3", "target": "4", "type": "replace", "tags": "subdivided"},
            {"id": "4", "source": "3", "target": "5", "type": "replace", "tags": "subdivided"},
            {"id": "5", "source": "6", "target": "1", "type": "replace", "tags": "modified"},
            {"id": "6", "source": "5", "target": "7", "type": "replace", "tags": "modified"},
        ],
    }
    p = tmp_path / "graph_fuse.json"
    p.write_text(_json.dumps(graph))
    nodes, edges = read_temporal_graphs(spark, [str(p)])
    rec = reconcile_nodes(nodes)
    ded = dedup_edges(resolve_edges(edges, nodes))

    from py3dtilers_spark.operators.temporal import aggregate_transactions

    rows = aggregate_transactions(ded).collect()
    txs = {
        (r["tx_type"], tuple(r["sources"]), tuple(r["destinations"]),
         r["start_year"], r["end_year"], r["is_aggregate"])
        for r in rows
    }
    assert ("union", ("2009::A", "2009::B"), ("2012::AB",), 2009, 2012, False) in txs
    assert (
        "division", ("2012::AB",), ("2015::AB1", "2015::AB2"), 2012, 2015, False
    ) in txs
    assert all(r["transactions"] == [] for r in rows)  # no aggregate here

    n2, e2 = collapse_fusions(rec, ded)
    gids = {r["gid"]: r["start_year"] for r in n2.collect()}
    # A and B absorbed into AB; AB inherits the 2009 start; A0 edge rewired
    assert "2009::A" not in gids and "2009::B" not in gids
    assert gids["2012::AB"] == 2009
    e2_set = {(r["src_gid"], r["dst_gid"], r["tags"]) for r in e2.collect()}
    assert ("2006::A0", "2012::AB", "modified") in e2_set
    assert not any(t == "fused" for _, _, t in e2_set)

    n3, e3 = collapse_subdivisions(n2, e2)
    gids3 = {r["gid"]: r["start_year"] for r in n3.collect()}
    # AB (the subdivided node) is removed; AB1/AB2 survive with AB's
    # inherited 2009 start; the subdivision edges are retagged and rewired
    # up to AB's single ancestor A0; AB's own in-edge disappears
    assert "2012::AB" not in gids3
    assert gids3["2015::AB1"] == 2009 and gids3["2015::AB2"] == 2009
    assert "2018::Z" in gids3 and "2006::A0" in gids3
    e3_set = {(r["src_gid"], r["dst_gid"], r["tags"]) for r in e3.collect()}
    assert e3_set == {
        ("2006::A0", "2015::AB1", "subdivided,modified"),
        ("2006::A0", "2015::AB2", "subdivided,modified"),
        ("2015::AB2", "2018::Z", "modified"),
    }


def test_requalification_aggregate(spark, tmp_path):
    """H7 re-qualification (CityTemporalTiler.py:143-166): a node whose >= 2
    in-edges are ALL plain 'modified' gets them re-tagged fused, and the
    union pass emits a TransactionAggregate nesting [union, modification]
    children that replicate the shared attributes (:216-226)."""
    import json as _json

    from py3dtilers_spark.operators.temporal import aggregate_transactions

    graph = {
        "nodes": [
            {"id": "1", "globalid": "2009::P"},
            {"id": "2", "globalid": "2009::Q"},
            {"id": "3", "globalid": "2012::R"},
        ],
        "edges": [
            {"id": "1", "source": "1", "target": "3", "type": "replace", "tags": "modified"},
            {"id": "2", "source": "2", "target": "3", "type": "replace", "tags": "modified"},
        ],
    }
    p = tmp_path / "graph_req.json"
    p.write_text(_json.dumps(graph))
    nodes, edges = read_temporal_graphs(spark, [str(p)])
    ded = dedup_edges(resolve_edges(edges, nodes))

    rows = aggregate_transactions(ded).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["tx_type"] == "aggregate" and r["is_aggregate"]
    assert r["sources"] == ["2009::P", "2009::Q"]
    assert r["destinations"] == ["2012::R"]
    assert (r["start_year"], r["end_year"]) == (2009, 2012)
    kids = [(c["tx_type"], c["sources"], c["destinations"],
             c["start_year"], c["end_year"]) for c in r["transactions"]]
    assert kids == [
        ("union", ["2009::P", "2009::Q"], ["2012::R"], 2009, 2012),
        ("modification", ["2009::P", "2009::Q"], ["2012::R"], 2009, 2012),
    ]
    # the 1-1 modification pass must NOT fire (in-degree 2)
    tx = transactions(ded).collect()
    assert tx == []

    # without re-qualification the fan-in stays invisible
    assert aggregate_transactions(ded, requalify=False).collect() == []
