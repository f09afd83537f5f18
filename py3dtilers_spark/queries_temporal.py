"""Temporal-graph queries (S7/J6/J7/U6/A10/O4/H6/H7) with DuckDB oracles.

The graph is synthesized deterministically from the orders table with SQL
both engines evaluate identically: buildings b (every 23rd order key) exist
at up to three time stamps (2009/2012/2015); two overlapping "files" cover
(2009,2012) and (2012,2015) — year-2012 nodes appear in BOTH files, which is
exactly the global-id reconciliation case (J7); consecutive-year edges carry
hash-chosen change tags, and every 7th edge is duplicated (U6's input).

The file-based GraphML-JSON scan itself (S7) is covered by
tests/test_temporal.py against a fixture in the reference's format.

Note: tg_pairs uses an un-partitioned lead() — that window lives in the
FIXTURE-synthesis SQL only (consecutive-building adjacency over the ~2.6k
synthetic buildings at sf0.01; both engines run the same text), never in
the engine operators, which are all partitioned. Spark logs its
single-partition WindowExec warning for it; at real scale the graph comes
from files (S7 scan) and this CTE does not exist.
"""
from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .data.features import load_table
from .operators.temporal import (
    aggregate_transactions,
    collapse_lineages,
    dedup_edges,
    edge_type_counts,
    node_local,
    reconcile_nodes,
    resolve_edges,
    timestamps,
    transactions,
)

TG_CTES = """
tg_base AS (
  SELECT o_orderkey AS b,
         ((o_orderkey % 1000003) * 999983) % 1000000007 AS hb
  FROM orders WHERE o_orderkey % 23 = 0
),
tg_nodes_all AS (
  SELECT b, hb, g.i AS yi,
         CAST(2009 + g.i * 3 AS STRING) || '::BLD_' || CAST(b AS STRING) AS gid
  FROM tg_base CROSS JOIN grid64 g
  WHERE g.i < 3 AND (hb + g.i * 37) % 5 <> 0
),
tg_nodes AS (
  SELECT f.i AS file_id, n.b, n.hb, n.yi, n.gid,
         n.b * 4 + n.yi AS local_id
  FROM tg_nodes_all n CROSS JOIN grid64 f
  WHERE f.i < 2 AND (n.yi = f.i OR n.yi = f.i + 1)
),
tg_edges_base AS (
  SELECT s.file_id,
         s.b * 8 + s.file_id * 2 + c.i AS edge_id,
         s.local_id AS src, d.local_id AS dst,
         CASE CAST((s.hb + s.file_id) % 5 AS INT)
              WHEN 0 THEN 'unchanged' WHEN 1 THEN 'modified'
              WHEN 2 THEN 're-ided' WHEN 3 THEN 'subdivided'
              ELSE 'fused' END AS tags
  FROM tg_nodes s
  JOIN tg_nodes d
    ON s.file_id = d.file_id AND s.b = d.b
   AND s.yi = s.file_id AND d.yi = s.file_id + 1
  CROSS JOIN grid64 c
  WHERE c.i < CASE WHEN (s.hb + s.file_id) % 7 = 0 THEN 2 ELSE 1 END
),
tg_pairs AS (
  SELECT b, hb, lead(b) OVER (ORDER BY b) AS b2
  FROM tg_base
),
tg_edges_x AS (
  SELECT s.file_id,
         p.b * 8 + s.file_id * 2 + 5 AS edge_id,
         s.local_id AS src, d.local_id AS dst,
         CASE CAST((p.hb + s.file_id) % 3 AS INT)
              WHEN 0 THEN 'fused' WHEN 1 THEN 'modified'
              ELSE 'subdivided' END AS tags
  FROM tg_pairs p
  JOIN tg_nodes s ON s.b = p.b2 AND s.yi = s.file_id
  JOIN tg_nodes d ON d.b = p.b AND d.file_id = s.file_id AND d.yi = s.file_id + 1
  WHERE p.hb % 3 = 0 AND p.b2 IS NOT NULL
),
tg_edges AS (
  SELECT * FROM tg_edges_base UNION ALL SELECT * FROM tg_edges_x
)""".strip()

SPARK_GRID64 = "grid64 AS (SELECT id AS i FROM range(64))"
DUCK_GRID64 = "grid64 AS (SELECT CAST(g AS BIGINT) AS i FROM range(64) t(g))"

# deduped, gid-resolved edge set — the SQL mirror of
# resolve_edges + dedup_edges (operators/temporal.py)
TG_DEDUP_CTES = """
tg_resolved AS (
  SELECT e.file_id, e.edge_id, s.gid AS src_gid, d.gid AS dst_gid, e.tags
  FROM tg_edges e
  JOIN tg_nodes s ON s.file_id = e.file_id AND s.local_id = e.src
  JOIN tg_nodes d ON d.file_id = e.file_id AND d.local_id = e.dst
),
tg_dedup AS (
  SELECT src_gid, dst_gid, file_id, edge_id, tags FROM (
    SELECT src_gid, dst_gid, file_id, edge_id, tags,
           row_number() OVER (PARTITION BY src_gid, dst_gid
                              ORDER BY file_id, edge_id) AS r
    FROM tg_resolved) t
  WHERE r = 1
)""".strip()


def _duck_sql(body: str, extra: str = "") -> str:
    ctes = [DUCK_GRID64, TG_CTES, TG_DEDUP_CTES]
    if extra:
        ctes.append(extra)
    return "WITH RECURSIVE " + ",\n".join(ctes) + "\n" + body


def _tg_frames(spark: SparkSession, sf_dir: str):
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    pre = "WITH " + ",\n".join([SPARK_GRID64, TG_CTES]) + "\n"
    nodes = spark.sql(pre + "SELECT file_id, local_id, gid FROM tg_nodes")
    edges = spark.sql(pre + "SELECT file_id, edge_id, src, dst, tags FROM tg_edges")
    return nodes, edges


# --------------------------------------------------------------------- J7

def q_tg_reconcile(spark, sf_dir):
    nodes, _ = _tg_frames(spark, sf_dir)
    return reconcile_nodes(nodes)


def tg_reconcile_oracle() -> str:
    return _duck_sql(
        "SELECT gid, min(file_id) AS first_file, count(*) AS n_files"
        " FROM tg_nodes GROUP BY gid"
    )


# --------------------------------------------------------------------- U6

def q_tg_edge_counts(spark, sf_dir):
    nodes, edges = _tg_frames(spark, sf_dir)
    return edge_type_counts(dedup_edges(resolve_edges(edges, nodes)))


def tg_edge_counts_oracle() -> str:
    return _duck_sql("SELECT tags, count(*) AS n_edges FROM tg_dedup GROUP BY tags")


# --------------------------------------------------------------------- O4

def q_tg_timestamps(spark, sf_dir):
    nodes, _ = _tg_frames(spark, sf_dir)
    return timestamps(reconcile_nodes(nodes))


def tg_timestamps_oracle() -> str:
    return _duck_sql(
        "SELECT CAST(split_part(gid, '::', 1) AS BIGINT) AS ts,"
        " count(*) AS n_nodes"
        " FROM (SELECT DISTINCT gid FROM tg_nodes) GROUP BY ts"
    )


# --------------------------------------------------------------------- J6

def q_tg_building_join(spark, sf_dir):
    """Temporal node -> building attribute join: parse the local gml id out
    of the globalid and equi-join the orders 'building' row
    (combine_nodes_with_buildings, CityTemporalTiler.py:94-122)."""
    nodes, _ = _tg_frames(spark, sf_dir)
    rec = reconcile_nodes(nodes).withColumn(
        "b", F.expr("CAST(substr(split(gid, '::')[1], 5) AS BIGINT)")
    )
    orders = load_table(spark, sf_dir, "orders").selectExpr(
        "o_orderkey AS b", "o_custkey"
    )
    return rec.join(orders, "b").select("gid", "o_custkey")


def tg_building_join_oracle() -> str:
    return _duck_sql(
        "SELECT n.gid, o.o_custkey"
        " FROM (SELECT DISTINCT gid, b FROM tg_nodes) n"
        " JOIN orders o ON o.o_orderkey = n.b"
    )


# --------------------------------------------------------------------- H6

def q_tg_lineage(spark, sf_dir):
    nodes, edges = _tg_frames(spark, sf_dir)
    rec = reconcile_nodes(nodes)
    ded = dedup_edges(resolve_edges(edges, nodes))
    return collapse_lineages(rec, ded)


def tg_lineage_oracle() -> str:
    extra = """
e11 AS (
  SELECT src_gid, dst_gid FROM tg_dedup
  WHERE tags IN ('unchanged', 're-ided')
    AND src_gid IN (SELECT src_gid FROM tg_dedup GROUP BY src_gid HAVING count(*) = 1)
    AND dst_gid IN (SELECT dst_gid FROM tg_dedup GROUP BY dst_gid HAVING count(*) = 1)
),
walk AS (
  SELECT src_gid AS root, src_gid AS cur, CAST(1 AS BIGINT) AS n
  FROM e11 WHERE src_gid NOT IN (SELECT dst_gid FROM e11)
  UNION ALL
  SELECT w.root, e.dst_gid, w.n + 1
  FROM walk w JOIN e11 e ON e.src_gid = w.cur
),
chain_ends AS (
  SELECT root, cur, n FROM walk
  WHERE cur NOT IN (SELECT src_gid FROM e11)
),
singles AS (
  SELECT gid AS root, gid AS cur, CAST(1 AS BIGINT) AS n
  FROM (SELECT DISTINCT gid FROM tg_nodes)
  WHERE gid NOT IN (SELECT src_gid FROM e11)
    AND gid NOT IN (SELECT dst_gid FROM e11)
)""".strip()
    return _duck_sql(
        "SELECT cur AS gid,"
        " CAST(split_part(root, '::', 1) AS BIGINT) AS start_year,"
        " CAST(split_part(cur, '::', 1) AS BIGINT) AS end_year,"
        " n AS chain_len"
        " FROM (SELECT * FROM chain_ends UNION ALL SELECT * FROM singles)",
        extra=extra,
    )


# --------------------------------------------------------------------- H7

def q_tg_tx_agg(spark, sf_dir):
    """H7 union/division + re-qualification + TransactionAggregate nesting
    (CityTemporalTiler.py:143-279), flattened to hashable scalars: the
    nested children replicate the parent's attributes and differ only by
    type, so (tx_type, n_nested, nested_types) pins the full structure."""
    nodes, edges = _tg_frames(spark, sf_dir)
    tx = aggregate_transactions(dedup_edges(resolve_edges(edges, nodes)))
    return tx.select(
        "tx_type",
        F.array_join("sources", ",").alias("sources"),
        F.array_join("destinations", ",").alias("destinations"),
        "start_year",
        "end_year",
        F.size("transactions").alias("n_nested"),
        F.array_join("transactions.tx_type", ",").alias("nested_types"),
    )


def tg_tx_agg_oracle() -> str:
    extra = """
tg_req AS (
  SELECT src_gid, dst_gid,
         tags
         || CASE WHEN dst_gid IN (
              SELECT dst_gid FROM tg_dedup GROUP BY dst_gid
              HAVING count(*) >= 2 AND bool_and(tags LIKE '%modified%'))
            THEN ',fused' ELSE '' END
         || CASE WHEN src_gid IN (
              SELECT src_gid FROM tg_dedup GROUP BY src_gid
              HAVING count(*) >= 2 AND bool_and(tags LIKE '%modified%'))
            THEN ',subdivided' ELSE '' END AS tags
  FROM tg_dedup
),
tg_unions AS (
  SELECT 'union' AS base_type,
         string_agg(src_gid, ',' ORDER BY src_gid) AS sources,
         dst_gid AS destinations,
         max(CAST(split_part(src_gid, '::', 1) AS BIGINT)) AS start_year,
         CAST(split_part(dst_gid, '::', 1) AS BIGINT) AS end_year,
         bool_or(tags LIKE '%modified%') AS agg_req
  FROM tg_req GROUP BY dst_gid
  HAVING count(*) >= 2 AND bool_and(tags LIKE '%fused%')
),
tg_divisions AS (
  SELECT 'division' AS base_type,
         src_gid AS sources,
         string_agg(dst_gid, ',' ORDER BY dst_gid) AS destinations,
         CAST(split_part(src_gid, '::', 1) AS BIGINT) AS start_year,
         min(CAST(split_part(dst_gid, '::', 1) AS BIGINT)) AS end_year,
         bool_or(tags LIKE '%modified%') AS agg_req
  FROM tg_req GROUP BY src_gid
  HAVING count(*) >= 2 AND bool_and(tags LIKE '%subdivided%')
)""".strip()
    return _duck_sql(
        "SELECT CASE WHEN agg_req THEN 'aggregate' ELSE base_type END AS tx_type,"
        " sources, destinations, start_year, end_year,"
        " CASE WHEN agg_req THEN 2 ELSE 0 END AS n_nested,"
        " CASE WHEN agg_req THEN base_type || ',modification' ELSE '' END AS nested_types"
        " FROM (SELECT * FROM tg_unions UNION ALL SELECT * FROM tg_divisions)",
        extra=extra,
    )


def register(queries: dict) -> None:
    queries.update(
        {
            "tg_reconcile": (q_tg_reconcile, tg_reconcile_oracle()),
            "tg_edge_counts": (q_tg_edge_counts, tg_edge_counts_oracle()),
            "tg_timestamps": (q_tg_timestamps, tg_timestamps_oracle()),
            "tg_building_join": (q_tg_building_join, tg_building_join_oracle()),
            "tg_lineage": (q_tg_lineage, tg_lineage_oracle()),
            "tg_tx_agg": (q_tg_tx_agg, tg_tx_agg_oracle()),
        }
    )
