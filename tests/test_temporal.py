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
    ancestors (in-edges rewired down); subdivision absorbs same-date
    descendants (out-edges rewired up)."""
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

    txs = {
        (r["tx_type"], tuple(r["sources"]), tuple(r["destinations"]),
         r["start_year"], r["end_year"], r["is_aggregate"])
        for r in aggregate_transactions(ded).collect()
    }
    assert ("union", ("2009::A", "2009::B"), ("2012::AB",), 2009, 2012, False) in txs
    assert (
        "division", ("2012::AB",), ("2015::AB1", "2015::AB2"), 2012, 2015, False
    ) in txs

    n2, e2 = collapse_fusions(rec, ded)
    gids = {r["gid"]: r["start_year"] for r in n2.collect()}
    # A and B absorbed into AB; AB inherits the 2009 start; A0 edge rewired
    assert "2009::A" not in gids and "2009::B" not in gids
    assert gids["2012::AB"] == 2009
    e2_set = {(r["src_gid"], r["dst_gid"], r["tags"]) for r in e2.collect()}
    assert ("2006::A0", "2012::AB", "modified") in e2_set
    assert not any(t == "fused" for _, _, t in e2_set)

    n3, e3 = collapse_subdivisions(n2, e2)
    gids3 = {r["gid"] for r in n3.collect()}
    # AB1/AB2 absorbed into AB; AB2's out-edge rewired up to AB
    assert "2015::AB1" not in gids3 and "2015::AB2" not in gids3
    assert "2012::AB" in gids3 and "2018::Z" in gids3
    e3_set = {(r["src_gid"], r["dst_gid"], r["tags"]) for r in e3.collect()}
    assert ("2012::AB", "2018::Z", "modified") in e3_set
    assert not any(t == "subdivided" for _, _, t in e3_set)
