"""Approximate nearest neighbors over the embeddings table.

Two paths (engine additions for training-data pipelines):
- brute-force cosine top-k (queries.q_ann_cosine) — the correctness baseline;
  broadcast query set x full scan, fold-based dot products.
- LSH-bucketed (this module) — the 100 TB path: P random-hyperplane sign bits
  form a bucket key; candidates = same-bucket rows only, reranked by exact
  cosine. Hyperplanes are seed-stable literals embedded in both the Spark
  plan and the DuckDB oracle, so results are bit-identical.

Shuffle shape at scale: one groupBy(bucket) instead of a crossJoin; bucket
skew is bounded by P (2^P buckets) and AQE skew splitting.
"""
from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 8
DIM = 64


def _planes() -> np.ndarray:
    """Seed-stable +/-1 hyperplanes (embedded as literals both engines)."""
    vals = np.empty((N_PLANES, DIM), dtype=np.float64)
    state = 88172645463325252
    for p in range(N_PLANES):
        for i in range(DIM):
            # xorshift64 — plain integer arithmetic, reproducible anywhere
            state ^= (state << 13) & 0xFFFFFFFFFFFFFFFF
            state ^= state >> 7
            state ^= (state << 17) & 0xFFFFFFFFFFFFFFFF
            vals[p, i] = 1.0 if state % 2 == 0 else -1.0
    return vals

PLANES = _planes()


def _plane_array_sql(p: int) -> str:
    return "[" + ", ".join(f"{v:.1f}" for v in PLANES[p]) + "]"


def _spark_bucket_expr() -> str:
    bits = []
    for p in range(N_PLANES):
        arr = "array(" + ", ".join(f"{v:.1f}D" for v in PLANES[p]) + ")"
        dot = f"aggregate(zip_with(e, {arr}, (a, b) -> a * b), 0.0D, (acc, v) -> acc + v)"
        bits.append(f"(CASE WHEN {dot} >= 0.0 THEN {1 << p} ELSE 0 END)")
    return " + ".join(bits)


def _duck_bucket_expr() -> str:
    bits = []
    for p in range(N_PLANES):
        dot = f"list_dot_product(e, {_plane_array_sql(p)}::DOUBLE[])"
        bits.append(f"(CASE WHEN {dot} >= 0.0 THEN {1 << p} ELSE 0 END)")
    return " + ".join(bits)


def ann_lsh_topk(emb: DataFrame, query_mod: int = 100, k: int = 5) -> DataFrame:
    """(q_id, rk, neighbor_id) — exact cosine rerank within LSH bucket."""
    base = emb.selectExpr(
        "vec_id", "transform(embedding, v -> CAST(v AS DOUBLE)) AS e"
    ).selectExpr(
        "vec_id", "e",
        f"CAST({_spark_bucket_expr()} AS BIGINT) AS bucket",
        "sqrt(aggregate(e, 0.0D, (acc, v) -> acc + v * v)) AS nrm",
    )
    q = base.where(f"vec_id % {query_mod} = 0").selectExpr(
        "vec_id AS q_id", "e AS qe", "nrm AS qn", "bucket"
    )
    scored = base.join(F.broadcast(q), "bucket").where("vec_id <> q_id").selectExpr(
        "q_id", "vec_id",
        "aggregate(zip_with(e, qe, (a, b) -> a * b), 0.0D, (acc, v) -> acc + v) / (nrm * qn) AS cos_sim",
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(f"rk <= {k}")
        .select("q_id", "rk", F.col("vec_id").alias("neighbor_id"))
    )


def ann_lsh_oracle_sql(query_mod: int = 100, k: int = 5) -> str:
    return f"""
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), bucketed AS (
  SELECT vec_id, e,
         CAST({_duck_bucket_expr()} AS BIGINT) AS bucket,
         sqrt(list_dot_product(e, e)) AS nrm
  FROM base
), q AS (
  SELECT vec_id AS q_id, e AS qe, nrm AS qn, bucket
  FROM bucketed WHERE vec_id % {query_mod} = 0
)
SELECT q_id,
       CAST(row_number() OVER (PARTITION BY q_id
            ORDER BY list_dot_product(e, qe) / (nrm * qn) DESC, vec_id) AS INT) AS rk,
       vec_id AS neighbor_id
FROM bucketed JOIN q USING (bucket)
WHERE vec_id <> q_id
QUALIFY rk <= {k}
"""
