"""Connected components over near-duplicate pair lists.

The dedup stages (MinHash LSH / embedding near-dup) emit PAIRS; collapsing
a corpus needs the transitive closure — pick one survivor per duplicate
CLUSTER, not per pair. No counterpart in the reference (its dedup is a
per-ring dict, Common/polygon_extrusion.py has nothing transitive); this is
the canonical "dedup at scale" missing piece.

Algorithm: min-label propagation with pointer jumping (path halving) — the
two-step update of the large-star/small-star family (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14, public):

  1. neighbor step: lab(v) <- min(lab(v), min over neighbors lab(u))
  2. jump step:     lab(v) <- lab(lab(v))

Both steps are shuffle equi-joins on node/label keys; pointer jumping makes
the round count O(log diameter) instead of O(diameter), so a 10^9-edge
graph converges in ~20 rounds of hash joins. Each round is checkpointed
(localCheckpoint) to truncate lineage — an iterative plan would otherwise
grow exponentially.

Determinism: the component id is the MINIMUM node id of the component
(byte-wise string order, matching DuckDB's binary collation), independent
of iteration order.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "doc_a", dst: str = "doc_b", max_iter: int = 30
) -> DataFrame:
    """(node, component) for every node appearing in `edges`; component =
    min node id reachable. Undirected (edges symmetrized here)."""
    e = edges.selectExpr(f"{src} AS src", f"{dst} AS dst")
    e = e.union(e.selectExpr("dst AS src", "src AS dst")).distinct()
    e = e.localCheckpoint(eager=True)

    labels = (
        e.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lab", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # 1. neighbor min propagation
        prop = (
            e.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("lab").alias("nlab"))
        )
        stepped = (
            labels.join(prop, "node", "left")
            .select(
                "node",
                F.least(F.col("lab"), F.coalesce("nlab", "lab")).alias("lab"),
            )
        )
        # 2. pointer jump: lab <- lab(lab)
        jump = labels.selectExpr("node AS lab", "lab AS jlab")
        new_labels = (
            stepped.join(jump, "lab", "left")
            .select(
                "node",
                F.least(F.col("lab"), F.coalesce("jlab", "lab")).alias("lab"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where("n.lab <> o.lab")
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", F.col("lab").alias("component"))


def component_stats(labels: DataFrame) -> DataFrame:
    """(component, n_members) — the cluster-size profile a dedup pass
    reports (survivor selection keeps component == node rows)."""
    return labels.groupBy("component").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members")
    )
