"""Temporal city-graph subsystem (S7/J6/J7/U6/A10/O4/H6/H7).

DataFrame re-expression of the reference's object graph
(/root/reference/py3dtilers/CityTiler/temporal_graph.py:9-1112 and
CityTemporalTiler.py:94-279): nodes are building versions identified by
``globalid = '<year>::<local gml id>'``; edges carry change tags
(unchanged / modified / re-ided / subdivided / fused).

The reference holds the whole graph as linked Python objects on one thread;
here every stage is a join/aggregation over two DataFrames —

  nodes(file_id, local_id, gid)      edges(file_id, edge_id, src, dst, tags)

so a continent-scale, century-deep graph shards like any other table:
- reconciliation (J7)  = min-file dedupe on gid + broadcast id->gid remap
  (temporal_graph.py:525-583 extend_with_subgraph)
- duplicate edges (U6) = groupBy (src_gid, dst_gid) keep-first
  (temporal_graph.py:912-937)
- lineage collapse (H6 stage 1) = iterative label propagation over 1-to-1
  unchanged/re-ided chains — T-1 converging joins for T time stamps
  (temporal_graph.py:995-1010), each a hash join on gid
- transactions (H7)    = a projection of the simplified edge set
  (CityTemporalTiler.py:125-142)
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

COLLAPSIBLE = ("unchanged", "re-ided")


def read_temporal_graphs(spark: SparkSession, paths: list[str]):
    """S7: scan GraphML-JSON files (the 3DUse ChangeDetection output format,
    graph_<y1>-<y2>.json) into (nodes, edges) DataFrames. file_id = the
    position of the path in `paths` (the reference blends files in CLI
    order, temporal_graph.py:868-907)."""
    nodes = None
    edges = None
    for i, p in enumerate(paths):
        raw = spark.read.option("multiLine", "true").json(p)
        n = raw.select(F.explode("nodes").alias("n")).selectExpr(
            f"CAST({i} AS BIGINT) AS file_id",
            "CAST(n.id AS BIGINT) AS local_id",  # boost::ptree writes ints as strings
            "n.globalid AS gid",
        )
        e = raw.select(F.explode("edges").alias("e")).selectExpr(
            f"CAST({i} AS BIGINT) AS file_id",
            "CAST(e.id AS BIGINT) AS edge_id",
            "CAST(e.source AS BIGINT) AS src",
            "CAST(e.target AS BIGINT) AS dst",
            "e.tags AS tags",
        )
        nodes = n if nodes is None else nodes.unionByName(n)
        edges = e if edges is None else edges.unionByName(e)
    return nodes, edges


def node_year(gid_col="gid"):
    """Time stamp parsed from the global id (temporal_graph.py:217-218)."""
    return F.split(F.col(gid_col), "::").getItem(0).cast("bigint")


def node_local(gid_col="gid"):
    return F.split(F.col(gid_col), "::").getItem(1)


def reconcile_nodes(nodes: DataFrame) -> DataFrame:
    """J7: blend per-file node sets — one canonical node per globalid, the
    lowest file wins, later files' local ids retained as the trace count
    (the reference's file_ids string, temporal_graph.py:525-556)."""
    return nodes.groupBy("gid").agg(
        F.min("file_id").alias("first_file"),
        F.count(F.lit(1)).alias("n_files"),
    )


def resolve_edges(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """Rewire integer (file-local) edge endpoints to global ids — the
    distributed form of edge.set_ancestor(find_node_from_id(...))
    (temporal_graph.py:893-901). Two hash joins on (file_id, local_id)."""
    src_map = nodes.selectExpr("file_id", "local_id AS src", "gid AS src_gid")
    dst_map = nodes.selectExpr("file_id", "local_id AS dst", "gid AS dst_gid")
    return (
        edges.join(src_map, ["file_id", "src"])
        .join(dst_map, ["file_id", "dst"])
        .select("file_id", "edge_id", "src_gid", "dst_gid", "tags")
    )


def dedup_edges(resolved: DataFrame) -> DataFrame:
    """U6: duplicate-edge removal — first (lowest file, lowest id) edge per
    (ancestor gid, descendant gid) survives (temporal_graph.py:912-937
    keeps the first-seen descendant edge per node)."""
    return resolved.groupBy("src_gid", "dst_gid").agg(
        F.min(F.struct("file_id", "edge_id", "tags")).alias("k")
    ).select(
        "src_gid", "dst_gid",
        F.col("k.file_id").alias("file_id"),
        F.col("k.edge_id").alias("edge_id"),
        F.col("k.tags").alias("tags"),
    )


def edge_type_counts(resolved: DataFrame) -> DataFrame:
    """A10: per-tag edge counts (display_characteristics,
    temporal_graph.py:774-801)."""
    return resolved.groupBy("tags").agg(F.count(F.lit(1)).alias("n_edges"))


def timestamps(nodes_rec: DataFrame) -> DataFrame:
    """O4: the ordered distinct time stamps + node count per stamp
    (extract_time_stamps, temporal_graph.py:851-861)."""
    return (
        nodes_rec.select(node_year().alias("ts"))
        .groupBy("ts")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )


def collapse_lineages(nodes_rec: DataFrame, edges_d: DataFrame) -> DataFrame:
    """H6 (simplify stage 1): collapse chains of one-to-one
    unchanged/re-ided edges into single lineage intervals
    (temporal_graph.py:995-1010). Keeps the most recent node of each chain
    (the reference deletes ancestors), with start date inherited from the
    chain head.

    Distributed shape: eligible edges = tag-filtered edges whose ancestor
    has out-degree 1 AND descendant in-degree 1 (over ALL edges); then
    label-propagation along chains — one hash join per time step, with the
    frontier halving-style convergence bounded by the number of time stamps
    (3DUse graphs span decades: tens of iterations at most, each a plain
    equi-join; no driver-side graph object ever exists).
    """
    out_deg = edges_d.groupBy("src_gid").agg(F.count(F.lit(1)).alias("od"))
    in_deg = edges_d.groupBy("dst_gid").agg(F.count(F.lit(1)).alias("id_"))
    e11 = (
        edges_d.where(F.col("tags").isin(*COLLAPSIBLE))
        .join(out_deg, "src_gid")
        .join(in_deg, "dst_gid")
        .where("od = 1 AND id_ = 1")
        .select("src_gid", "dst_gid")
        # consumed by the heads anti-join + every propagation step: pin it
        # once (this is the iterative-join idiom closure.py uses too)
        .localCheckpoint(eager=True)
    )
    e_step = e11.selectExpr("src_gid AS cur", "dst_gid AS nxt")
    # chain heads: sources that are not a destination of any eligible edge
    heads = e11.select("src_gid").join(
        e11.selectExpr("dst_gid AS src_gid"), "src_gid", "left_anti"
    ).selectExpr("src_gid AS root", "src_gid AS cur", "CAST(1 AS BIGINT) AS n")
    frontier = heads
    closed = None
    while True:
        step = frontier.join(e_step, "cur", "left").select(
            "root",
            F.coalesce(F.col("nxt"), F.col("cur")).alias("cur"),
            (F.col("n") + F.when(F.col("nxt").isNull(), 0).otherwise(1)).alias("n"),
            F.col("nxt").isNull().alias("done"),
        )
        step = step.localCheckpoint(eager=True)
        fin = step.where("done").drop("done")
        closed = fin if closed is None else closed.unionByName(fin)
        frontier = step.where("NOT done").drop("done")
        if frontier.isEmpty():
            break
    singles = (
        nodes_rec.select("gid")
        .join(e11.selectExpr("src_gid AS gid"), "gid", "left_anti")
        .join(e11.selectExpr("dst_gid AS gid"), "gid", "left_anti")
        .selectExpr("gid AS root", "gid AS cur", "CAST(1 AS BIGINT) AS n")
    )
    all_chains = closed.unionByName(singles) if closed is not None else singles
    return all_chains.select(
        F.col("cur").alias("gid"),  # surviving (most recent) node
        node_year("root").alias("start_year"),
        node_year("cur").alias("end_year"),
        F.col("n").alias("chain_len"),
    )


def collapse_fusions(nodes_rec: DataFrame, edges_d: DataFrame):
    """H6 stage 2 (temporal_graph.py:1013-1060): sweeping time stamps old ->
    new, a node with AT LEAST TWO ancestor edges, ALL 'fused'
    (are_all_ancestor_edges_of_type requires >= 2, temporal_graph.py:150-163),
    whose ancestors all share one (start, end) date pair
    (do_all_ancestor_nodes_share_same_date, :179-196) absorbs them — the
    ancestors' own in-edges rewire down to it
    (collapse_edge_and_remove_ancestor, :694-730), the ancestors and the
    fused edges disappear, and it inherits the shared ancestor start date.

    When one ancestor fuses into TWO heirs at the same stamp the sequential
    reference would sys.exit in delete_node (the second collapse sees a node
    already removed, :603-631); here each absorbed ancestor deterministically
    rewires to its lowest-gid heir and every fused in-edge of every candidate
    is removed.

    Returns (nodes', edges'): nodes' = (gid, start_year), edges' = the
    surviving edge set. One converging join set per time stamp — the sweep
    length is the stamp count, never the node count.
    """
    nodes = nodes_rec.select(
        "gid", node_year().alias("start_year")
    ).localCheckpoint(eager=True)
    edges = edges_d.select("src_gid", "dst_gid", "tags").localCheckpoint(eager=True)
    stamps = sorted(
        r["ts"] for r in nodes.select(node_year("gid").alias("ts")).distinct().collect()
    )
    for t in stamps[1:]:  # stage applies to nodes WITH ancestors
        # per destination at stamp t: aggregate its in-edges + ancestor facts
        anc = nodes.selectExpr(
            "gid AS src_gid", "start_year AS anc_start"
        ).withColumn("anc_stamp", node_year("src_gid"))
        cand = (
            edges.where(node_year("dst_gid") == t)
            .join(anc, "src_gid")
            .groupBy("dst_gid")
            .agg(
                F.expr("every(tags LIKE '%fused%')").alias("all_fused"),
                F.count(F.lit(1)).alias("n_in"),
                F.countDistinct("anc_start").alias("n_starts"),
                F.countDistinct("anc_stamp").alias("n_stamps"),
                F.min("anc_start").alias("new_start"),
            )
            .where("all_fused AND n_in >= 2 AND n_starts = 1 AND n_stamps = 1")
            .select("dst_gid", "new_start")
            .localCheckpoint(eager=True)
        )
        if cand.isEmpty():
            continue
        # one heir per absorbed ancestor (lowest gid = the deterministic
        # stand-in for the reference's first-processed heir)
        absorbed = (
            edges.join(cand.select("dst_gid"), "dst_gid")
            .groupBy(F.col("src_gid").alias("gid"))
            .agg(F.min("dst_gid").alias("heir"))
            .localCheckpoint(eager=True)
        )
        # rewire in-edges of absorbed ancestors to the heir; drop every edge
        # adjacent to a candidate's fused in-edge set (src side: the absorbed
        # ancestor's residual out-edges would dangle in the reference too)
        rewired = (
            edges.join(absorbed.selectExpr("gid AS dst_gid", "heir"), "dst_gid", "left")
            .select(
                "src_gid",
                F.coalesce("heir", F.col("dst_gid")).alias("dst_gid"),
                "tags",
            )
        )
        edges = (
            rewired.join(
                absorbed.selectExpr("gid AS src_gid"), "src_gid", "left_anti"
            )
            .localCheckpoint(eager=True)
        )
        nodes = (
            nodes.join(absorbed.select("gid"), "gid", "left_anti")
            .join(cand.selectExpr("dst_gid AS gid", "new_start"), "gid", "left")
            .select(
                "gid", F.coalesce("new_start", F.col("start_year")).alias("start_year")
            )
            .localCheckpoint(eager=True)
        )
    return nodes, edges


def collapse_subdivisions(nodes_df: DataFrame, edges_df: DataFrame):
    """H6 stage 3 (temporal_graph.py:1062-1112): sweeping old -> new, a node
    with AT LEAST TWO descendant edges, ALL 'subdivided'
    (are_all_descendant_edges_of_type, :165-177), whose descendants all share
    one (start, end) date pair and which has AT MOST ONE ancestor edge
    (>1 is explicitly left untouched, :1063-1066) is REMOVED and its
    descendants survive, inheriting its start date:

    - 0 ancestor edges: the node and its subdivision edges are simply
      deleted (:1074-1086 — "this sub-division was not a geometrical one").
    - 1 ancestor edge: the subdivision edges first get 'modified' appended
      (descendant_edge.set_modified(), :1092-1096 — append, so the tag pair
      is 'subdivided,modified'), then split_edge_and_remove_descendant
      (:732-773) rewires them up to the node's single ancestor and deletes
      both the node and its ancestor edge.

    nodes_df: (gid, start_year); returns (nodes', edges')."""
    nodes = nodes_df.localCheckpoint(eager=True)
    edges = edges_df.select("src_gid", "dst_gid", "tags").localCheckpoint(eager=True)
    stamps = sorted(
        r["ts"] for r in nodes.select(node_year("gid").alias("ts")).distinct().collect()
    )
    for t in stamps:
        desc = nodes.selectExpr("gid AS dst_gid", "start_year AS desc_start").withColumn(
            "desc_stamp", node_year("dst_gid")
        )
        in_deg = edges.groupBy(F.col("dst_gid").alias("src_gid")).agg(
            F.count(F.lit(1)).alias("n_in")
        )
        cand = (
            edges.where(node_year("src_gid") == t)
            .join(desc, "dst_gid")
            .groupBy("src_gid")
            .agg(
                F.expr("every(tags LIKE '%subdivided%')").alias("all_sub"),
                F.count(F.lit(1)).alias("n_out"),
                F.countDistinct("desc_start").alias("n_starts"),
                F.countDistinct("desc_stamp").alias("n_stamps"),
            )
            .where("all_sub AND n_out >= 2 AND n_starts = 1 AND n_stamps = 1")
            .join(in_deg, "src_gid", "left")
            .where("n_in IS NULL OR n_in <= 1")
            .select("src_gid")
            .join(nodes.selectExpr("gid AS src_gid", "start_year AS cand_start"),
                  "src_gid")
            .localCheckpoint(eager=True)
        )
        if cand.isEmpty():
            continue
        # the (at most one) ancestor edge of each candidate: anc -> cand
        anc1 = (
            edges.join(cand.selectExpr("src_gid AS dst_gid"), "dst_gid")
            .selectExpr("dst_gid AS cand_gid", "src_gid AS anc_gid")
            .localCheckpoint(eager=True)
        )
        # out-edges of candidates: deleted when the candidate has no
        # ancestor, rewired (anc -> desc, +',modified') when it has one
        out_e = edges.join(
            cand.selectExpr("src_gid", "cand_start"), "src_gid"
        )
        rewired_up = (
            out_e.join(anc1.selectExpr("cand_gid AS src_gid", "anc_gid"), "src_gid")
            .select(
                F.col("anc_gid").alias("src_gid"),
                "dst_gid",
                F.concat(F.col("tags"), F.lit(",modified")).alias("tags"),
            )
        )
        kept = (
            edges.join(cand.select("src_gid"), "src_gid", "left_anti")
            .join(cand.selectExpr("src_gid AS dst_gid"), "dst_gid", "left_anti")
        )
        edges = kept.unionByName(rewired_up).localCheckpoint(eager=True)
        # descendants inherit the candidate's start date (min across
        # candidates sharing a descendant — the sequential order is
        # list-dependent in the reference)
        desc_start = out_e.groupBy(F.col("dst_gid").alias("gid")).agg(
            F.min("cand_start").alias("inh_start")
        )
        nodes = (
            nodes.join(cand.selectExpr("src_gid AS gid"), "gid", "left_anti")
            .join(desc_start, "gid", "left")
            .select(
                "gid",
                F.coalesce("inh_start", F.col("start_year")).alias("start_year"),
            )
            .localCheckpoint(eager=True)
        )
    return nodes, edges


def requalify_edges(edges_d: DataFrame) -> DataFrame:
    """H7 re-qualification pass (CityTemporalTiler.py:143-166): a node with
    >= 2 in-edges ALL 'modified' marks an incompletely-labelled fusion —
    each such in-edge gets 'fused' appended; symmetrically >= 2 all-modified
    out-edges get 'subdivided' appended. The >= 2 floor comes from
    are_all_ancestor_edges_of_type (temporal_graph.py:150-163). Both passes
    test is_modified (tag CONTAINS modified), so appending 'fused' first
    never hides an edge from the second pass — order-independent."""
    req_in = (
        edges_d.groupBy("dst_gid")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("every(tags LIKE '%modified%')").alias("allm"),
        )
        .where("n >= 2 AND allm")
        .select("dst_gid", F.lit(True).alias("add_fused"))
    )
    req_out = (
        edges_d.groupBy("src_gid")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("every(tags LIKE '%modified%')").alias("allm"),
        )
        .where("n >= 2 AND allm")
        .select("src_gid", F.lit(True).alias("add_sub"))
    )
    return (
        edges_d.join(req_in, "dst_gid", "left")
        .join(req_out, "src_gid", "left")
        .select(
            "src_gid",
            "dst_gid",
            F.concat(
                F.col("tags"),
                F.when(F.col("add_fused"), F.lit(",fused")).otherwise(F.lit("")),
                F.when(F.col("add_sub"), F.lit(",subdivided")).otherwise(F.lit("")),
            ).alias("tags"),
        )
    )


# nested transaction payload (H7): the reference's TemporalTransactionAggregate
# replicates every base attribute into each nested PrimaryTransaction
# (replicate_from, CityTemporalTiler.py:211-226), so the children differ only
# by type — materialized here as a full struct per child.
_CHILD = (
    "named_struct('tx_type', {t}, 'sources', sources, 'destinations',"
    " destinations, 'start_year', start_year, 'end_year', end_year)"
)


def _with_nesting(df: DataFrame, primary: str) -> DataFrame:
    """Wrap a primary-transaction frame: when agg_req, the row becomes a
    TransactionAggregate holding [primary, modification] children
    (CityTemporalTiler.py:216-226 / :270-279); otherwise the primary stands
    alone with no children."""
    child_p = _CHILD.format(t=f"'{primary}'")
    child_m = _CHILD.format(t="'modification'")
    return df.select(
        F.expr(f"IF(agg_req, 'aggregate', '{primary}')").alias("tx_type"),
        "sources",
        "destinations",
        "start_year",
        "end_year",
        F.col("agg_req").alias("is_aggregate"),
        F.expr(
            f"IF(agg_req, array({child_p}, {child_m}),"
            " CAST(array() AS ARRAY<STRUCT<tx_type: STRING,"
            " sources: ARRAY<STRING>, destinations: ARRAY<STRING>,"
            " start_year: BIGINT, end_year: BIGINT>>))"
        ).alias("transactions"),
    )


def aggregate_transactions(edges_d: DataFrame, requalify: bool = True) -> DataFrame:
    """H7 union/division case (CityTemporalTiler.py:166-279): a node with
    >= 2 in-edges all 'fused' yields a union transaction over its sorted
    ancestor global ids; a node with >= 2 out-edges all 'subdivided' yields
    a division over its sorted descendants (the >= 2 floor is
    are_all_*_edges_of_type, temporal_graph.py:150-177). When any
    participating edge ALSO carries 'modified', the reference wraps the
    primary in a TransactionAggregate nesting [primary, modification] —
    emitted here as tx_type='aggregate' with the children in `transactions`
    (each child replicating the shared attributes, replicate_from).

    Runs the re-qualification pass first (requalify=True) so pure-modified
    fan-in/fan-out nodes surface as aggregates too (CityTemporalTiler.py:
    143-166). One groupBy per direction; no driver graph."""
    if requalify:
        edges_d = requalify_edges(edges_d)
    unions = (
        edges_d.groupBy("dst_gid")
        .agg(
            F.expr("every(tags LIKE '%fused%')").alias("all_fused"),
            F.count(F.lit(1)).alias("n_in"),
            F.sort_array(F.collect_list("src_gid")).alias("sources"),
            F.expr("bool_or(tags LIKE '%modified%')").alias("agg_req"),
            F.max(F.expr("CAST(split_part(src_gid, '::', 1) AS BIGINT)")).alias(
                "start_year"
            ),
        )
        .where("all_fused AND n_in >= 2")
        .select(
            "sources",
            F.array("dst_gid").alias("destinations"),
            "start_year",
            node_year("dst_gid").alias("end_year"),
            "agg_req",
        )
    )
    divisions = (
        edges_d.groupBy("src_gid")
        .agg(
            F.expr("every(tags LIKE '%subdivided%')").alias("all_sub"),
            F.count(F.lit(1)).alias("n_out"),
            F.sort_array(F.collect_list("dst_gid")).alias("destinations"),
            F.expr("bool_or(tags LIKE '%modified%')").alias("agg_req"),
            F.min(F.expr("CAST(split_part(dst_gid, '::', 1) AS BIGINT)")).alias(
                "end_year"
            ),
        )
        .where("all_sub AND n_out >= 2")
        .select(
            F.array("src_gid").alias("sources"),
            "destinations",
            node_year("src_gid").alias("start_year"),
            "end_year",
            "agg_req",
        )
    )
    return _with_nesting(unions, "union").unionByName(
        _with_nesting(divisions, "division")
    )


def transactions(edges_d: DataFrame) -> DataFrame:
    """H7: modified one-to-one edges become 'modification' transactions
    spanning [ancestor year, descendant year] (CityTemporalTiler.py:125-142;
    is_modified = tag CONTAINS modified, so stage-3's 'subdivided,modified'
    edges qualify when 1-1 — they never are, their split leaves the new
    ancestor with >= 2 out-edges, but the predicate matches the
    reference's)."""
    out_deg = edges_d.groupBy("src_gid").agg(F.count(F.lit(1)).alias("od"))
    in_deg = edges_d.groupBy("dst_gid").agg(F.count(F.lit(1)).alias("id_"))
    return (
        edges_d.where(F.col("tags").like("%modified%"))
        .join(out_deg, "src_gid")
        .join(in_deg, "dst_gid")
        .where("od = 1 AND id_ = 1")
        .select(
            F.col("src_gid").alias("source"),
            F.col("dst_gid").alias("destination"),
            F.lit("modification").alias("tx_type"),
            node_year("src_gid").alias("start_year"),
            node_year("dst_gid").alias("end_year"),
        )
    )
