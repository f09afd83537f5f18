"""Iterative ancestor closure over an edge table (reference H5: batch-table
hierarchy, database_accesses_batch_table_hierarchy.py:86-144, and the
TreeWithChildrenAndParent adjacency, tree_with_children_and_parent.py:1-29).

Spark shape: frontier iteration — each round joins the frontier's parent to
the edge table and unions the new (node, ancestor, depth) pairs; terminates
when the frontier is empty. log-depth rounds for the balanced hierarchies
the reference builds (building -> surface chains are depth <= 3)."""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ancestor_closure(edges: DataFrame, max_depth: int = 32) -> DataFrame:
    """edges: (child, parent). Returns (node, ancestor, depth>=1).

    Driver loop with localCheckpoint per round (truncates lineage). At scale
    each round is one shuffle keyed by the join column; for the reference's
    fixed-depth hierarchies the loop runs <= depth rounds.
    """
    frontier = edges.select(
        F.col("child").alias("node"),
        F.col("parent").alias("ancestor"),
        F.lit(1).alias("depth"),
    )
    out = frontier
    depth = 1
    while depth < max_depth:
        nxt = (
            frontier.join(
                edges.withColumnRenamed("child", "ancestor").withColumnRenamed(
                    "parent", "next_anc"
                ),
                "ancestor",
            )
            .select(
                "node",
                F.col("next_anc").alias("ancestor"),
                (F.col("depth") + 1).alias("depth"),
            )
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        out = out.unionByName(nxt)
        frontier = nxt
        depth += 1
    return out
